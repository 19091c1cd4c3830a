from .fastpath import verified_pbs_fast, compute_chain, native_step
from .vpbs import (VpbsParams, TEST_PARAMS, StepLayout, StepCircuit,
                   build_step_circuit, get_step_circuit, verified_pbs,
                   verified_pbs_batch, verify_pbs, verify_hash_output,
                   get_recursive_step_circuit, verified_pbs_recursive,
                   verified_pbs_recursive_batch, verify_pbs_recursive)

__all__ = ["verified_pbs_fast", "compute_chain", "native_step",
           "VpbsParams", "TEST_PARAMS", "StepLayout", "StepCircuit",
           "build_step_circuit", "get_step_circuit", "verified_pbs",
           "verified_pbs_batch", "verify_pbs", "verify_hash_output",
           "get_recursive_step_circuit", "verified_pbs_recursive",
           "verified_pbs_recursive_batch", "verify_pbs_recursive"]
