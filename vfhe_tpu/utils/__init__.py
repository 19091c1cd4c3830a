from .timing import TimingTree
from .profiling import device_trace

__all__ = ["TimingTree", "device_trace"]
