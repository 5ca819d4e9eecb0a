from egorear_tpu.ops.heatmap import (
    render_gaussian_targets,
    render_gaussian_targets_np,
    argmax_2d,
    soft_argmax_2d,
)
from egorear_tpu.ops.camera import CameraRig, fisheye_world2camera, apply_se3
from egorear_tpu.ops.metrics import (
    mpjpe,
    pa_mpjpe,
    pck_3d,
    auc_3d,
    procrustes_align,
)
from egorear_tpu.ops.deform_attn import deformable_sampling
