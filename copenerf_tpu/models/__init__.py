from .embedder import embed_dim, positional_encoding
from .fields import (ColorConfig, MotionConfig, NerfConfig, SDFConfig,
                     VarianceConfig, color_apply, color_init, configs_from_cfg,
                     init_all_fields, motion_apply, motion_init, nerf_apply,
                     nerf_init, sdf_apply, sdf_init, sdf_value,
                     sdf_with_gradient, variance_init, variance_inv_s)
from .mlp import effective_weight, linear_apply, make_linear, softplus
