from . import adpcm_stream  # noqa: F401
