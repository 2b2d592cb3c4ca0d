from formula_1_spark.queries.registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
