from transit_scrape_spark.functions.gridref import os_grid_reference, os_grid_reference_udf

__all__ = ["os_grid_reference", "os_grid_reference_udf"]
