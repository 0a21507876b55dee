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


class BatchVerificationError(VerificationError):
    """A batched verification failed; `failed_indices` names every proof in
    the batch whose individual equation does not hold (located by bisection
    — ~log2(k) extra MSM checks per bad proof, beyond-reference API)."""

    def __init__(self, failed_indices):
        self.failed_indices = sorted(failed_indices)
        super().__init__(
            f"batch verification failed at indices {self.failed_indices}")


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


def bisect_batch_failures(check, k):
    """Locate every failing item of a LINEAR batch check by bisection.

    `check(idxs)` must return True iff the combined equation over the subset
    holds.  Linearity gives the invariant that a failing set has at least
    one failing half (sum_lo + sum_hi == sum_union), so each level re-checks
    at most both halves; total extra checks are O(b * log2 k) for b bad
    items.  Call only after `check(range(k))` has already failed."""
    bad = []
    stack = [list(range(k))]
    while stack:
        idxs = stack.pop()           # invariant: check(idxs) is False
        if len(idxs) == 1:
            bad.append(idxs[0])
            continue
        mid = len(idxs) // 2
        lo, hi = idxs[:mid], idxs[mid:]
        lo_bad = not check(lo)
        if lo_bad:
            stack.append(lo)
        # lo passing implies hi is bad (linearity); lo failing still
        # requires an explicit hi check (multiple bad items)
        if not lo_bad or not check(hi):
            stack.append(hi)
    return sorted(bad)


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
