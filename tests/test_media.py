"""Video/audio container codecs + multimodal sampling operators."""

import numpy as np
import pytest


def test_video_roundtrip_and_seek():
    from raster2dggs_spark.codecs import decode_video, encode_video, video_meta

    frames = np.arange(5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    buf = encode_video(frames)
    assert video_meta(buf) == (5, 7, 3)
    assert np.array_equal(decode_video(buf), frames)
    assert np.array_equal(decode_video(buf, [0, 4]), frames[[0, 4]])
    with pytest.raises(ValueError):
        video_meta(b"XXXX" + buf[4:])


def test_audio_roundtrip():
    from raster2dggs_spark.codecs import decode_audio, encode_audio

    x = ((np.arange(5000) * 31) % 65536 - 32768).astype(np.int16)
    buf = encode_audio(x, 22_050)
    y, rate = decode_audio(buf)
    assert rate == 22_050
    assert np.array_equal(x, y)


def test_frame_sample_feeds_image_stats(spark):
    """The video→image handoff: sampled frames are raw-codec image rows
    that image_stats can decode; the recomputed stats match a direct
    NumPy replay of the generator's closed-form pixel field."""
    from raster2dggs_spark.operators.multimodal import frame_sample, image_stats
    from raster2dggs_spark.sources.media import (
        generate_videos_pdf, video_pixels, videos_spark_df,
    )
    from pyspark.sql import functions as F

    v = videos_spark_df(spark, 6, seed=42)
    fs = frame_sample(v, n_samples=3)
    imgs = fs.select(
        F.concat_ws("#", "video_id", F.col("frame_idx").cast("string"))
        .alias("image_id"),
        F.col("frame_bytes").alias("bytes"),
        F.lit("raw").alias("fmt"),
    )
    stats = image_stats(imgs).toPandas().set_index("image_id")
    pdf = generate_videos_pdf(6, seed=42)
    checked = 0
    for i, r in enumerate(pdf.itertuples(index=False)):
        idx = np.unique((np.arange(3) * r.n_frames) // 3)
        for fi in idx.tolist():
            fr = video_pixels(i, np.array([fi]), r.h, r.w)[0]
            row = stats.loc[f"{r.video_id}#{fi}"]
            assert row["px"] == r.h * r.w
            # image_stats accumulates in the array's float32 dtype
            assert row["b1_mean"] == pytest.approx(float(fr.mean()), abs=0)
            checked += 1
    assert checked >= 18


def test_frame_sample_rejects_external_codec(spark):
    from raster2dggs_spark.operators.multimodal import frame_sample
    from raster2dggs_spark.sources.media import videos_spark_df
    from pyspark.sql import functions as F
    from pyspark.errors import PythonException

    v = videos_spark_df(spark, 1, seed=1).withColumn("fmt", F.lit("mp4"))
    with pytest.raises(PythonException, match="NotImplementedError"):
        frame_sample(v).collect()


def test_audio_features_match_numpy(spark):
    from raster2dggs_spark.operators.multimodal import audio_features
    from raster2dggs_spark.sources.media import audio_samples, audio_spark_df

    W = 512
    a = audio_spark_df(spark, 3, seed=42)
    lens = {r["audio_id"]: r["n_samples"] for r in
            a.select("audio_id", "n_samples").collect()}
    out = audio_features(a, window=W).toPandas()
    for aid, n in lens.items():
        v = int(aid.split("_")[1])
        x = audio_samples(v, n).astype(np.int64)
        nwin = n // W
        got = out[out.audio_id == aid].sort_values("win_idx")
        assert len(got) == nwin
        xw = x[: nwin * W].reshape(nwin, W)
        assert np.array_equal(
            got["rms"].values, np.sqrt((xw * xw).sum(axis=1) / float(W)))
        assert np.array_equal(
            got["zero_crossings"].values,
            ((xw[:, :-1] * xw[:, 1:]) < 0).sum(axis=1))
        assert np.array_equal(got["peak"].values, np.abs(xw).max(axis=1))
