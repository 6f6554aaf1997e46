from . import describe, detect, gaussian, keypoints, match, orientation, pyramid, ransac, sampling  # noqa: F401
