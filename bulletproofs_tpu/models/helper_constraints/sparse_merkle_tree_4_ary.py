"""4-ary sparse Merkle tree: native tree over a HashDb + leaf-inclusion
verification gadget
(`/root/reference/src/r1cs/gadgets/helper_constraints/sparse_merkle_tree_4_ary.rs`).

Per level the gadget allocates 2 index bits and selects the hidden node's
position among the 3 proof nodes with the arithmetic mux documented at
`sparse_merkle_tree_4_ary.rs:215-253`, then hashes the 4 children with
Poseidon_hash_4 constraints.
"""

from ...config import curve
from ...ops.field_host import Scalar
from ...r1cs.linear_combination import LinearCombination, Variable
from ...utils.errors import R1CSError
from . import constrain_lc_with_scalar, get_byte_size
from .poseidon import (PoseidonParams, Poseidon_hash_4,
                       Poseidon_hash_4_constraints, SboxType)

# DBVal_4_ary = [Scalar; 4], ProofNode_4_ary = [Scalar; 3] (lists here)


def get_base_4_repr(scalar: Scalar, num_digits: int):
    """Big-endian base-4 digits of `scalar`, exactly `num_digits` of them
    (`sparse_merkle_tree_4_ary.rs:21-43`)."""
    byte_size = get_byte_size(num_digits, 4)
    if byte_size > curve().modbytes:
        raise R1CSError(
            f"limit_bytes cannot be more than {curve().modbytes} "
            f"but found {byte_size}")
    s = int(scalar)
    digits = []
    while len(digits) != num_digits and s != 0:
        digits.append(s & 3)
        s >>= 2
    while len(digits) != num_digits:
        digits.append(0)
    digits.reverse()
    return digits


class VanillaSparseMerkleTree_4:
    """`sparse_merkle_tree_4_ary.rs:48-209`"""

    def __init__(self, hash_params: PoseidonParams, depth: int, hash_db):
        self.depth = depth
        self.hash_params = hash_params
        empty = [Scalar.zero()]
        for i in range(1, depth + 1):
            prev = empty[i - 1]
            children = [prev] * 4
            new = Poseidon_hash_4(children, hash_params, SboxType.Quint)
            hash_db.insert(new.to_bytes(), list(children))
            empty.append(new)
        self.root = empty[depth]

    def update(self, idx: Scalar, val: Scalar, hash_db) -> Scalar:
        proof = []
        self.get(idx, proof, hash_db)
        path = self.leaf_index_to_path(idx, self.depth)
        path.reverse()
        cur_val = val
        sidenodes = list(proof)
        for d in path:
            side = list(sidenodes.pop())
            side.insert(d, cur_val)
            h = Poseidon_hash_4(side, self.hash_params, SboxType.Quint)
            hash_db.insert(h.to_bytes(), side)
            cur_val = h
        self.root = cur_val
        return cur_val

    def batch_update(self, pairs, hash_db) -> Scalar:
        """Bulk update: apply [(idx, val), ...] and return the new root.

        Produces the same final root and (final) node set as sequential
        `update` calls — interior hashes depend only on final leaf values
        and the last write per index wins — but each tree level's Poseidon
        hashes run as ONE batched device kernel
        (ops/poseidon_device.py), so k updates cost `depth` batched rounds
        instead of k * depth serial permutations (the reference's hot loop,
        `sparse_merkle_tree_4_ary.rs:89-127`).  Per-update intermediate
        roots are not materialized."""
        if not pairs:
            return self.root
        from ...ops.poseidon_device import poseidon_hash_4_batch
        pending = {}
        for idx, val in pairs:
            pending[tuple(self.leaf_index_to_path(idx, self.depth))] = val
        # ONE cached descent over the union of touched prefixes (the
        # per-parent root walks were O(k * depth^2) dict hops — VERDICT r3
        # smt4_updates_per_s profiling)
        prefixes = sorted({p[:k] for p in pending for k in range(len(p))},
                          key=len)
        node_at = {(): self.root}
        pre_children = {}
        for pre in prefixes:
            ch = list(hash_db.get(node_at[pre].to_bytes()))
            pre_children[pre] = ch
            for d in range(4):
                node_at[pre + (d,)] = ch[d]
        for _level in range(self.depth, 0, -1):
            groups = {}
            for path, val in pending.items():
                groups.setdefault(path[:-1], {})[path[-1]] = val
            parents = sorted(groups)
            child_lists = []
            for ppath in parents:
                children = list(pre_children[ppath])
                for d, v in groups[ppath].items():
                    children[d] = v
                child_lists.append(children)
            if len(child_lists) >= 8:
                hashes = poseidon_hash_4_batch(
                    child_lists, self.hash_params, SboxType.Quint)
            else:
                hashes = [Poseidon_hash_4(cl, self.hash_params,
                                          SboxType.Quint)
                          for cl in child_lists]
            pending = {}
            for ppath, cl, h in zip(parents, child_lists, hashes):
                hash_db.insert(h.to_bytes(), cl)
                pending[ppath] = h
        self.root = pending[()]
        return self.root

    def _children_at(self, ppath, hash_db):
        """Children list of the PRE-batch node addressed by path digits."""
        cur = self.root
        for d in ppath:
            cur = hash_db.get(cur.to_bytes())[d]
        return list(hash_db.get(cur.to_bytes()))

    def get(self, idx: Scalar, proof, hash_db) -> Scalar:
        """Walk root->leaf; if `proof` is a list, append the 3 sibling nodes
        per level."""
        path = self.leaf_index_to_path(idx, self.depth)
        cur_node = self.root
        need_proof = proof is not None
        for d in path:
            children = hash_db.get(cur_node.to_bytes())
            if need_proof:
                proof.append([c for i, c in enumerate(children) if i != d])
            cur_node = children[d]
        return cur_node

    def verify_proof(self, idx: Scalar, val: Scalar, proof, root=None):
        path = self.leaf_index_to_path(idx, self.depth)
        path.reverse()
        cur_val = val
        for i, d in enumerate(path):
            p = list(proof[self.depth - 1 - i])
            p.insert(d, cur_val)
            cur_val = Poseidon_hash_4(p, self.hash_params, SboxType.Quint)
        target = root if root is not None else self.root
        return cur_val == target

    @staticmethod
    def leaf_index_to_path(idx: Scalar, depth: int):
        return get_base_4_repr(idx, depth)


def vanilla_merkle_merkle_tree_4_verif_gadget(
        cs, depth: int, expected_root: Scalar, leaf_val, leaf_index,
        proof_nodes, statics, poseidon_params: PoseidonParams, sbox_type):
    """Leaf-inclusion constraint circuit
    (`sparse_merkle_tree_4_ary.rs:254-381`).  `proof_nodes` are consumed from
    the END, 3 per level (leaf level last)."""
    prev_hash = LinearCombination.from_var(leaf_val)
    statics = [LinearCombination.coerce(s) for s in statics]
    proof_nodes = list(proof_nodes)

    constraint_leaf_index = [(leaf_index.variable, Scalar.minus_one())]
    exp_4 = Scalar.one()
    two = Scalar(2)
    four = Scalar(4)

    # little-endian MODBYTES of the index assignment (None for verifier)
    leaf_index_bytes = None
    if leaf_index.assignment is not None:
        leaf_index_bytes = leaf_index.assignment.v.to_bytes(
            curve().modbytes, "little")

    one = Scalar.one()
    for i in range(get_byte_size(depth, 4)):
        for j in range(4):
            if not proof_nodes:
                break

            def bit_alloc(shift):
                assignment = None
                if leaf_index_bytes is not None:
                    bit = (leaf_index_bytes[i] >> shift) & 1
                    assignment = (Scalar(bit), Scalar(1 - bit))
                b, b_1, o = cs.allocate_multiplier(assignment)
                cs.constrain(LinearCombination.from_var(o))
                cs.constrain(b + (b_1 - one))
                return b, b_1

            b0, b0_1 = bit_alloc(2 * j)
            b1, b1_1 = bit_alloc(2 * j + 1)

            constraint_leaf_index.append((b1, two * exp_4))
            constraint_leaf_index.append((b0, exp_4))

            N3 = LinearCombination.from_var(proof_nodes.pop())
            N2 = LinearCombination.from_var(proof_nodes.pop())
            N1 = LinearCombination.from_var(proof_nodes.pop())

            _, _, b0_1_b1_1 = cs.multiply(LinearCombination.from_var(b0_1),
                                          LinearCombination.from_var(b1_1))
            _, _, b0_1_b1 = cs.multiply(LinearCombination.from_var(b0_1),
                                        LinearCombination.from_var(b1))
            _, _, b0_b1_1 = cs.multiply(LinearCombination.from_var(b0),
                                        LinearCombination.from_var(b1_1))
            _, _, b0_b1 = cs.multiply(LinearCombination.from_var(b0),
                                      LinearCombination.from_var(b1))

            _, _, c0_1 = cs.multiply(LinearCombination.from_var(b0_1_b1_1),
                                     prev_hash)
            _, _, c0_2 = cs.multiply(Variable.one() - b0_1_b1_1, N1)
            c0 = c0_1 + c0_2

            c1_1 = N1 - c0_2
            _, _, c1_2 = cs.multiply(LinearCombination.from_var(b0_b1_1),
                                     prev_hash)
            _, _, c1_3 = cs.multiply(LinearCombination.from_var(b1), N2)
            c1 = c1_1 + LinearCombination.from_var(c1_2) + c1_3

            c2_1 = N2 - c1_3
            _, _, c2_2 = cs.multiply(LinearCombination.from_var(b0_1_b1),
                                     prev_hash)
            _, _, c2_3 = cs.multiply(LinearCombination.from_var(b0_b1), N3)
            c2 = c2_1 + LinearCombination.from_var(c2_2) + c2_3

            _, _, c3_1 = cs.multiply(LinearCombination.from_var(b0_b1),
                                     prev_hash)
            c3_2 = N3 - c2_3
            c3 = LinearCombination.from_var(c3_1) + c3_2

            prev_hash = Poseidon_hash_4_constraints(
                cs, [LinearCombination.coerce(c0), c1, c2, c3],
                statics, poseidon_params, sbox_type)
            prev_hash = prev_hash.simplify()

            exp_4 = exp_4 * four

    cs.constrain(LinearCombination(constraint_leaf_index))
    constrain_lc_with_scalar(cs, prev_hash, expected_root)
