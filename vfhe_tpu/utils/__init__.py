from .timing import TimingTree

__all__ = ["TimingTree"]
