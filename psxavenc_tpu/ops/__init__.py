from . import adpcm  # noqa: F401
