from censo_escolar_spark.functions import dates, decode, text, vectors  # noqa: F401
