from .vpbs import (VpbsParams, TEST_PARAMS, StepLayout, StepCircuit,
                   build_step_circuit, get_step_circuit, verified_pbs,
                   verified_pbs_batch, verify_pbs, verify_hash_output)

__all__ = ["VpbsParams", "TEST_PARAMS", "StepLayout", "StepCircuit",
           "build_step_circuit", "get_step_circuit", "verified_pbs",
           "verified_pbs_batch", "verify_pbs", "verify_hash_output"]
