from nerfsr_tpu.core.rays import (
    Rays,
    get_ray_directions,
    get_rays,
    ndc_rays,
)
from nerfsr_tpu.core.sampling import (
    cast_rays,
    sample_along_rays,
    resample_along_rays,
)
from nerfsr_tpu.core.encoding import positional_encoding, posenc_channels
from nerfsr_tpu.core.rendering import volumetric_rendering, sigma_activation

__all__ = [
    "Rays",
    "get_ray_directions",
    "get_rays",
    "ndc_rays",
    "cast_rays",
    "sample_along_rays",
    "resample_along_rays",
    "positional_encoding",
    "posenc_channels",
    "volumetric_rendering",
    "sigma_activation",
]
