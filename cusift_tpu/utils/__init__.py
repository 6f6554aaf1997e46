from . import image, timers  # noqa: F401
