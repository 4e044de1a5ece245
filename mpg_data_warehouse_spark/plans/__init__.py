"""Query plans: the reference's wrangle pipelines re-expressed as
single lazy Spark plans, and the driver-contract query registry."""
