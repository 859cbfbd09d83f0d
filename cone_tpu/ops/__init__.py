from cone_tpu.ops.spans import (
    span_xx_to_cxw,
    span_cxw_to_xx,
    temporal_iou,
    temporal_intersection_over_pred,
    generalized_temporal_iou,
)
from cone_tpu.ops.windows import (
    num_windows,
    window_bounds,
    window_scores_from_frame_scores,
    slice_windows,
)
from cone_tpu.ops.matching import hungarian_match
from cone_tpu.ops.pooling import masked_segment_mean, proposal_mean_pool
from cone_tpu.ops.nms import temporal_nms_host, temporal_nms_device
