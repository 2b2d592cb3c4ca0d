from formula_1_spark.operators.aggregates import conditional_count_agg, pre_aggregate
from formula_1_spark.operators.windows import rank_standings, two_phase_global_topk

__all__ = [
    "conditional_count_agg",
    "pre_aggregate",
    "rank_standings",
    "two_phase_global_topk",
]
