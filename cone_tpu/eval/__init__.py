from cone_tpu.eval.metrics import (
    evaluate_ego4d_nlq,
    evaluate_recall_table,
    evaluate_window_ranklists,
    display_ego4d_results,
    display_recall_table,
    display_window_results,
)
from cone_tpu.eval.pipeline import InferencePipeline
