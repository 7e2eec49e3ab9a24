from . import tvd, recon  # noqa: F401
