from tpu_pillars.evaluation.map_eval import (
    EvalBox, get_average_precisions, lyft_map,
)

__all__ = ["EvalBox", "get_average_precisions", "lyft_map"]
