"""Device prover/verifier path (ops/prover_device.py, ops/verifier_device.py).

The device path must be BIT-IDENTICAL to the host protocol: same transcript
schedule, same blinding draws, byte-equal proofs for the same rng seed
(`prover.rs:322-593` / `verifier.rs:267-457` parity is established by the
host tests; these tests pin device == host).
"""

import random

import pytest

import bulletproofs_tpu as bp
from bulletproofs_tpu import Prover, Verifier, backend as backend_mod
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.ops import prover_device, verifier_device
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu.utils.errors import R1CSError


@pytest.fixture
def device_path(monkeypatch):
    old_mode = backend_mod._mode
    backend_mod.set_backend("jax")
    monkeypatch.setattr(prover_device, "DEVICE_PROVER_MIN_N", 1)
    monkeypatch.setattr(verifier_device, "DEVICE_VERIFY_MIN_N", 1)
    yield
    backend_mod.set_backend(old_mode)


def _build(force_host, G, H, g, h):
    rng = random.Random(0xD07)
    tr = ProofTranscript(b"devpath")
    p = Prover(g, h, tr, rng=rng)
    comms = bound_check.prove_bounded_num(57, None, 10, 100, 8, rng, p)
    proof = p._prove(G, H) if force_host else p.prove(G, H)
    return proof, comms


def test_standalone_ipa_device_paths(device_path, monkeypatch, rng):
    """`create_ipp`/`verify_ipp` device dispatch (implicit-basis prover +
    device mega-MSM verifier) against the host path, byte-exact."""
    from bulletproofs_tpu import ipp as ipp_mod
    from bulletproofs_tpu.ops.ec_host import G1, msm_host
    from bulletproofs_tpu.ops.field_host import Scalar, inner_product

    monkeypatch.setattr(ipp_mod, "DEVICE_IPA_MIN_N", 1)
    n = 16
    G = get_generators("G", n)
    H = get_generators("H", n)
    Q = G1.from_msg_hash(b"Q")
    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    Gf = [Scalar.random(rng) for _ in range(n)]
    Hf = [Scalar.random(rng) for _ in range(n)]

    tr_dev = ProofTranscript(b"sipa")
    proof_dev = ipp_mod.create_ipp(tr_dev, Q, Gf, Hf, G, H, a, b)

    # host-path reference on the native C++ backend (compiling the jax fold
    # kernels here has hit an XLA:CPU compiler segfault in long pytest
    # processes; the C++ path is byte-identical by the cross-backend tests)
    monkeypatch.setattr(ipp_mod, "DEVICE_IPA_MIN_N", 1 << 30)
    backend_mod.set_backend("cpp")
    try:
        tr_host = ProofTranscript(b"sipa")
        proof_host = ipp_mod.create_ipp(tr_host, Q, Gf, Hf, G, H, a, b)
    finally:
        backend_mod.set_backend("jax")
    assert [p.to_bytes() for p in proof_dev.L] == \
           [p.to_bytes() for p in proof_host.L]
    assert proof_dev.a.v == proof_host.a.v
    assert proof_dev.b.v == proof_host.b.v

    # P = <a, G'> + <b, H'> + <a,b>Q for the factored bases
    scalars = ([x * f for x, f in zip(a, Gf)] + [x * f for x, f in zip(b, Hf)]
               + [inner_product(a, b)])
    P = msm_host(G + H + [Q], scalars)

    monkeypatch.setattr(ipp_mod, "DEVICE_IPA_MIN_N", 1)
    tr_v = ProofTranscript(b"sipa")
    ipp_mod.verify_ipp(n, tr_v, Gf, Hf, P, Q, G, H, proof_dev.a, proof_dev.b,
                       proof_dev.L, proof_dev.R)

    tr_bad = ProofTranscript(b"sipa")
    with pytest.raises(R1CSError):
        ipp_mod.verify_ipp(n, tr_bad, Gf, Hf, P + Q, Q, G, H, proof_dev.a,
                           proof_dev.b, proof_dev.L, proof_dev.R)


def test_device_prove_bit_exact_and_device_verify(device_path, rng):
    G = get_generators("G", 64)
    H = get_generators("H", 64)
    g = bp.G1.from_msg_hash(b"g")
    h = bp.G1.from_msg_hash(b"h")

    assert prover_device.device_prove_available(16)
    proof_dev, comms = _build(False, G, H, g, h)
    proof_host, _ = _build(True, G, H, g, h)
    assert proof_dev.to_bytes() == proof_host.to_bytes()

    # device verifier accepts
    tr = ProofTranscript(b"devpath")
    v = Verifier(tr)
    bound_check.verify_bounded_num(10, 100, 8, comms, v)
    assert verifier_device.device_verify_available(v.num_vars)
    v.verify(proof_dev, g, h, G, H)

    # device verifier rejects a tampered proof
    bad = bp.R1CSProof.from_bytes(proof_dev.to_bytes())
    bad.t_x = bad.t_x + bp.Scalar(1)
    tr = ProofTranscript(b"devpath")
    v = Verifier(tr)
    bound_check.verify_bounded_num(10, 100, 8, comms, v)
    with pytest.raises(R1CSError):
        v.verify(bad, g, h, G, H)
