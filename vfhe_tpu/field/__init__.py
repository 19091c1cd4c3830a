from . import goldilocks, extension

__all__ = ["goldilocks", "extension"]
