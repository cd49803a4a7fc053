"""Deterministic vector-side fixtures (FIXTURES.md §3): polygon zones and
query points with planted nearest neighbors — ground truth computable at
test time, no golden files."""

from __future__ import annotations

import numpy as np
import pandas as pd


def generate_zones_pdf(n_zones: int = 16, seed: int = 42) -> pd.DataFrame:
    """Convex/star polygons at mixed sizes; lon/lat vertex arrays."""
    rows = []
    for i in range(n_zones):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 7000 + i]))
        cx = rng.uniform(-150, 150)
        cy = rng.uniform(-65, 65)
        n_v = int(rng.integers(4, 9))
        radius = rng.uniform(0.5, 6.0)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n_v))
        rr = radius * rng.uniform(0.6, 1.0, n_v)
        xs = cx + rr * np.cos(ang) / max(0.2, np.cos(np.radians(cy)))
        ys = cy + rr * np.sin(ang)
        rows.append({
            "poly_id": i,
            "xs": xs.tolist(),
            "ys": ys.tolist(),
            "cx": cx,
            "cy": cy,
        })
    return pd.DataFrame(rows)


def generate_points_pdf(n_points: int = 2000, seed: int = 42,
                        zones: pd.DataFrame | None = None) -> pd.DataFrame:
    """Seeded points; if ``zones`` given, half are planted inside zone
    bounding circles so PIP joins are non-trivially populated."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 9001]))
    lon = rng.uniform(-179, 179, n_points)
    lat = np.degrees(np.arcsin(rng.uniform(-0.98, 0.98, n_points)))
    if zones is not None and len(zones):
        half = n_points // 2
        zi = rng.integers(0, len(zones), half)
        lon[:half] = zones["cx"].values[zi] + rng.normal(0, 2.0, half)
        lat[:half] = np.clip(zones["cy"].values[zi] + rng.normal(0, 2.0, half), -85, 85)
    return pd.DataFrame({
        "point_id": np.arange(n_points, dtype=np.int64),
        "lon": lon,
        "lat": lat,
    })
