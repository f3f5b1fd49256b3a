from . import libzstd

__all__ = ["libzstd"]
