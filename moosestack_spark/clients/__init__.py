from moosestack_spark.clients.cache import MooseCache  # noqa: F401
