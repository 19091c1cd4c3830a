from .prove import prove, preprocess, Proof, VerifierKey
from .verify import verify, VerificationError

__all__ = ["prove", "preprocess", "Proof", "VerifierKey", "verify",
           "VerificationError"]
