"""Error types mirroring the reference's `R1CSError` enum
(`/root/reference/src/errors.rs:7-28`) plus the two checking macros
(`errors.rs:32-55`) as plain functions.
"""


class R1CSError(Exception):
    """Base error for proving/verifying a constraint system."""


class InvalidGeneratorsLength(R1CSError):
    pass


class VerificationError(R1CSError):
    pass


class FormatError(R1CSError):
    pass


class MissingAssignment(R1CSError):
    pass


class GadgetError(R1CSError):
    def __init__(self, description: str):
        super().__init__(description)
        self.description = description


class HashNotFoundInDB(R1CSError):
    def __init__(self, hash_bytes):
        super().__init__(f"hash not found in DB: {bytes(hash_bytes).hex()}")
        self.hash = bytes(hash_bytes)


def check_for_randomness_or_rng(randomness, rng):
    """errors.rs:32-43 — at least one source of blinding randomness."""
    if randomness is None and rng is None:
        raise GadgetError("Since randomness is None, provide rng")


def check_for_input_and_randomness_length(inputs, randomness, expected):
    """errors.rs:45-55"""
    if len(inputs) != expected or len(randomness) != expected:
        raise GadgetError(
            f"Both input and randomness should be of the same size {expected} "
            f"but input size is {len(inputs)} and randomness size is "
            f"{len(randomness)}")
