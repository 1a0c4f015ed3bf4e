from log2ck_spark.functions.numeric import davg, dsum  # noqa: F401
