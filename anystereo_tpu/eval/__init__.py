from anystereo_tpu.eval.metrics import (  # noqa: F401
    AverageMeterDict,
    d1_metric,
    epe_metric,
    thres_metric,
    compute_metrics,
)
from anystereo_tpu.eval.padder import InputPadder  # noqa: F401
from anystereo_tpu.eval.occlusion import occ_mask, warp_disparity  # noqa: F401
