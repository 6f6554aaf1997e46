from . import sift, slam, sfm, twoview  # noqa: F401
