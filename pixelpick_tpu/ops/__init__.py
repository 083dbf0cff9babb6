from pixelpick_tpu.ops.resize import (
    resize_bilinear,
    resize_align_corners,
    interp_matrix,
    gather_bilinear_align_corners,
)
