from pulsar_3_2_codedump_spark.sources.pulsarlike import (  # noqa: F401
    PulsarLikeDataSource,
    register,
)
