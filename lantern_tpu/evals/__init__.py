from . import features, metrics  # noqa: F401
