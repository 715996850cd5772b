from . import curl

__all__ = ["curl"]
