from . import sift, twoview  # noqa: F401
