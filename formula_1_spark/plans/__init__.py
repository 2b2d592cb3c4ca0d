from formula_1_spark.plans.flatten import flatten_json
from formula_1_spark.plans.schema_spec import DatasetSpec, apply_spec

__all__ = ["flatten_json", "DatasetSpec", "apply_spec"]
