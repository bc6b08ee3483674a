from fever_spark.operators import aggregators, filters

__all__ = ["aggregators", "filters"]
