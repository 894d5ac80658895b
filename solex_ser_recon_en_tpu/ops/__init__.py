"""Device kernels (XLA + Pallas) for the reconstruction pipeline."""

from .reduce import mean_max, MeanMaxAccumulator  # noqa: F401
from .blur import box_blur, box_blur_u16  # noqa: F401
from .recon import reconstruct, build_shift_indices  # noqa: F401
from .stretch import rescale_brightness, percentile  # noqa: F401
from .clahe import clahe  # noqa: F401
