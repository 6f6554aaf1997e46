from . import ba, lie, posegraph  # noqa: F401
