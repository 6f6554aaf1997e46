from . import evaluation, kitti, synthetic, tum  # noqa: F401
