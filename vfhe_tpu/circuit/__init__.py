from .config import CircuitConfig, STANDARD_CONFIG, TEST_CONFIG
from .builder import CircuitBuilder
from .compile import CircuitData, PartialWitness

__all__ = ["CircuitConfig", "STANDARD_CONFIG", "TEST_CONFIG",
           "CircuitBuilder", "CircuitData", "PartialWitness"]
