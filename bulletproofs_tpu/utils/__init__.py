from .errors import (R1CSError, InvalidGeneratorsLength, VerificationError,
                     FormatError, MissingAssignment, GadgetError,
                     HashNotFoundInDB, check_for_randomness_or_rng,
                     check_for_input_and_randomness_length)
from .hash_db import HashDb, InMemoryHashDb
from .generators import gen_challenges, get_generators
from .vector_poly import VecPoly1, VecPoly3, Poly2, Poly6

__all__ = [
    "R1CSError", "InvalidGeneratorsLength", "VerificationError", "FormatError",
    "MissingAssignment", "GadgetError", "HashNotFoundInDB",
    "check_for_randomness_or_rng", "check_for_input_and_randomness_length",
    "HashDb", "InMemoryHashDb", "get_generators", "gen_challenges",
    "VecPoly1", "VecPoly3", "Poly2", "Poly6",
]
