from raster2dggs_spark.cli import main

main()
