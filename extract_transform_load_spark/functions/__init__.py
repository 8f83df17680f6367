from .decimals import dsum, dec, ratio  # noqa: F401
