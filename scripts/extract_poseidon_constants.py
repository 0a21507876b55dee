"""Extract the Poseidon protocol parameters (round constants + MDS matrices)
from the reference's constants table into a JSON data file.

These are cryptographic protocol PARAMETERS, not code: proofs only interop
with the reference if the exact same constants are used
(`/root/reference/src/r1cs/gadgets/poseidon_constants.rs`, feature-gated per
curve).  Run: python scripts/extract_poseidon_constants.py
"""

import json
import re
import sys

SRC = "/root/reference/src/r1cs/gadgets/poseidon_constants.rs"
DST = "bulletproofs_tpu/models/helper_constraints/poseidon_constants.json"


def main():
    text = open(SRC).read()
    # split into feature-gated blocks: each '#[cfg(feature = "x")]' is
    # immediately followed by one 'pub const NAME ... = [...];'
    out = {}
    pat = re.compile(
        r'#\[cfg\(feature = "(\w+)"\)\]\s*pub const (\w+):[^=]+=\s*(\[.*?\])\s*;',
        re.S)
    for feature, name, body in pat.findall(text):
        hexes = re.findall(r'"(0x[0-9a-fA-F]+)"', body)
        m = re.match(r'(MDS_ENTRIES|ROUND_CONSTS)_W_(\d)', name)
        kind, width = m.group(1), int(m.group(2))
        curve = out.setdefault(feature, {})
        entry = curve.setdefault(f"w{width}", {})
        if kind == "MDS_ENTRIES":
            entry["mds"] = [hexes[i * width:(i + 1) * width]
                            for i in range(width)]
        else:
            entry["round_consts"] = hexes
    for curve, widths in out.items():
        for w, entry in widths.items():
            width = int(w[1:])
            assert len(entry["mds"]) == width
            assert all(len(r) == width for r in entry["mds"])
    json.dump(out, open(DST, "w"))
    sizes = {c: {w: len(e["round_consts"]) for w, e in ws.items()}
             for c, ws in out.items()}
    print(json.dumps(sizes, indent=1))


if __name__ == "__main__":
    sys.exit(main())
