from . import io, viz  # noqa: F401
