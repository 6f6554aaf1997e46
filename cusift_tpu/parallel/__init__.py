from . import mesh, sharded, dist_ba  # noqa: F401
