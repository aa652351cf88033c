"""AUIDs: canonical area identifiers for CUID (cellid) sets.

Same externally observable behaviour as the reference's auids subsystem
(/root/reference/dggstools/auids/common.py and auids/rhpx.py): sorted CUIDs ->
prefix trie -> balanced-parentheses string (root '^', terminator '$', closing par
'?' by default, opening pars and trailing pars omitted) -> zlib -> urlsafe b64,
plus a blake2b-20 hash.  Implementation is from scratch on a plain dict trie
(no networkx): the trie layer is tiny and a dict is both faster and simpler than
the reference's nx.prefix_tree.

The distributed pre-pass that shrinks huge CUID sets before these driver-side
functions run lives in dggsray.ops.cellsets.
"""
from __future__ import annotations

import base64
import hashlib
import zlib
from typing import Sequence

DEFAULT_ROOT_NAME = "^"
DEFAULT_NIL_NAME = "$"
DEFAULT_PARS = "¿?"
DEFAULT_WITH_OPENING_PAR = False
DEFAULT_WITH_TRAILING_PARS = False
DEFAULT_HASH_DIGEST_SIZE = 20


class _Node(dict):
    """Trie node: child char -> _Node; `term` marks end-of-cuid."""
    __slots__ = ("term",)

    def __init__(self):
        super().__init__()
        self.term = False


def build_trie(cuids: Sequence[str]) -> _Node:
    """Build a trie from CUIDs (insertion in sorted order so child order is sorted;
    duplicates collapse for free, as the reference notes at auids/common.py:94-95)."""
    root = _Node()
    for cuid in sorted(cuids):
        node = root
        for ch in cuid:
            nxt = node.get(ch)
            if nxt is None:
                nxt = node[ch] = _Node()
            node = nxt
        node.term = True
    return root


def trie_to_ids(root: _Node) -> list[str]:
    out: list[str] = []
    stack: list[tuple[_Node, str]] = [(root, "")]
    while stack:
        node, prefix = stack.pop()
        if node.term:
            out.append(prefix)
        for ch in node:
            stack.append((node[ch], prefix + ch))
    return sorted(out)


def generate_bp_from_trie(root: _Node, pars: str = DEFAULT_PARS,
                          root_name: str = DEFAULT_ROOT_NAME,
                          nil_name: str = DEFAULT_NIL_NAME,
                          with_opening_par: bool = DEFAULT_WITH_OPENING_PAR) -> str:
    """Balanced-parentheses serialization, byte-identical to the reference's
    generate_BP_from_tree on the equivalent nx prefix tree (the NIL pseudo-leaf is
    always a node's first child because CUIDs are inserted sorted, so a prefix
    precedes its extensions)."""
    assert len(pars) == 2 and len(root_name) == 1 and len(nil_name) == 1
    op = pars[0] if with_opening_par else ""
    cl = pars[1]
    parts: list[str] = [op, root_name]

    def emit(node: _Node, ch: str):
        parts.append(op)
        parts.append(ch)
        if node.term:
            parts.append(op)
            parts.append(nil_name)
            parts.append(cl)
        for c in node:
            emit(node[c], c)
        parts.append(cl)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        for c in root:
            emit(root[c], c)
    finally:
        sys.setrecursionlimit(old)
    parts.append(cl)
    return "".join(parts)


def bp_to_trie(bp: str, pars: str = DEFAULT_PARS, nil_name: str = DEFAULT_NIL_NAME,
               with_opening_par: bool = DEFAULT_WITH_OPENING_PAR) -> _Node:
    root = _Node()
    stack = [root]
    for ch in bp:
        if ch == pars[0] and with_opening_par:
            continue
        if ch == pars[1]:
            if len(stack) > 1:
                stack.pop()
        elif ch == nil_name:
            stack[-1].term = True
            # the NIL node itself consumes one closing par in the BP form
            stack.append(stack[-1])
        else:
            node = _Node()
            stack[-1][ch] = node
            stack.append(node)
    return root


def encode64(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).decode("utf-8")


def decode64(s: str) -> bytes:
    return base64.urlsafe_b64decode(s)


def hash_id(idstr: str, digest_size: int = DEFAULT_HASH_DIGEST_SIZE):
    m = hashlib.blake2b(idstr.encode(), digest_size=digest_size)
    return m.digest(), encode64(m.digest())


def compress_id(idstr: str) -> bytes:
    return zlib.compress(idstr.encode("utf-8"))


def decompress_id_bytes(b: bytes) -> str:
    return zlib.decompress(b).decode("utf-8")


def generate_bp_auid_from_cuids(cuids: Sequence[str], pars: str = DEFAULT_PARS,
                                root_name: str = DEFAULT_ROOT_NAME,
                                nil_name: str = DEFAULT_NIL_NAME,
                                with_opening_par: bool = DEFAULT_WITH_OPENING_PAR,
                                with_trailing_pars: bool = DEFAULT_WITH_TRAILING_PARS):
    """CUIDs -> (auid, hash_bytes, hash_b64, compressed, compressed_b64, trie).
    Same tuple contract as the reference (auids/common.py:180-213)."""
    t = build_trie(cuids)
    auid = generate_bp_from_trie(t, pars, root_name, nil_name, with_opening_par)
    if not with_trailing_pars:
        auid = auid[: auid.rfind(nil_name) + 1]
    hashed, hashed_b64 = hash_id(auid)
    comp = compress_id(auid)
    return auid, hashed, hashed_b64, comp, encode64(comp), t


def generate_cuids_from_bp_auid(bp_auid: str, pars: str = DEFAULT_PARS,
                                root_name: str = DEFAULT_ROOT_NAME,
                                nil_name: str = DEFAULT_NIL_NAME,
                                with_opening_par: bool = DEFAULT_WITH_OPENING_PAR,
                                with_trailing_pars: bool = DEFAULT_WITH_TRAILING_PARS):
    if not with_trailing_pars:
        # restore trailing closing pars: one per node char not yet closed
        # (reference auids/common.py:228-240)
        count = 0
        for c in bp_auid:
            if c not in pars:
                count += 1
            elif c == pars[1]:
                count -= 1
        bp_auid = bp_auid + pars[1] * count
    pref = 1 if with_opening_par else 0
    body = bp_auid[len(root_name) + pref: -1]
    return trie_to_ids(bp_to_trie(body, pars, nil_name, with_opening_par))


# ---------------------------------------------------------------------------
# rHEALPix-specific: optimization (area-minimal CUID sets) and subarea test
# ---------------------------------------------------------------------------

def optimize_cuids(cuids: Sequence[str], n_side: int) -> list[str]:
    """Replace every complete set of n_side^2 sibling leaf-cells by their parent,
    iterated to fixpoint (reference optimize_cuids_rhealpix, auids/rhpx.py:108-181).
    A node that is itself terminal does not absorb its children (duplicate-area
    inputs keep both levels, matching the reference's NIL-sibling behaviour).
    Iterative post-order on the dict trie: O(total chars)."""
    root = build_trie(cuids)
    k = n_side * n_side

    def is_leaf(n: _Node) -> bool:
        return n.term and not n

    changed = True
    while changed:
        changed = False
        # post-order traversal
        stack: list[tuple[_Node, bool, bool]] = [(root, True, False)]
        while stack:
            node, is_root, processed = stack.pop()
            if not processed:
                stack.append((node, is_root, True))
                for c in node:
                    stack.append((node[c], False, False))
            else:
                if (not is_root and not node.term and len(node) == k
                        and all(is_leaf(v) for v in node.values())):
                    node.clear()
                    node.term = True
                    changed = True
    # root-level collapse is impossible by construction (faces are never digits)
    return trie_to_ids(root)


def is_optimal_cuids(cuids: Sequence[str], n_side: int) -> bool:
    """True iff optimize_cuids would be the identity: no complete sibling set of
    leaves exists anywhere (reference is_optimal_cuids_rhealpix,
    auids/rhpx.py:184-218, via the fixpoint equivalence)."""
    root = build_trie(cuids)
    k = n_side * n_side

    def is_leaf(n: _Node) -> bool:
        return n.term and not n

    stack: list[tuple[_Node, bool]] = [(root, True)]
    while stack:
        node, is_root = stack.pop()
        if (not is_root and not node.term and len(node) == k
                and all(is_leaf(v) for v in node.values())):
            return False
        for c in node:
            stack.append((node[c], False))
    return True


def is_a_subarea(auid1_comp_b64: str, auid2_comp_b64: str,
                 nil_name: str = DEFAULT_NIL_NAME) -> bool:
    """Containment test on optimal AUIDs via per-face substring checks (semantics of
    the reference is_a_subarea_rhealpix, auids/rhpx.py:11-50; false negatives possible
    for non-optimal inputs, as there)."""
    import re
    a1 = decompress_id_bytes(decode64(auid1_comp_b64))
    a2 = decompress_id_bytes(decode64(auid2_comp_b64))
    parts = re.split(r"([NOPQRS])", a1)
    result = True
    for i in range(1, len(parts), 2):
        sub = parts[i] + parts[i + 1]
        sub = sub[: sub.rfind(nil_name)] if nil_name in sub else sub
        result = result and (sub in a2)
    return result


class AUIDGenerator:
    """DGGS-independent generator (reference auids/common.py:248-296)."""

    def __init__(self, pars: str = DEFAULT_PARS, root_name: str = DEFAULT_ROOT_NAME,
                 nil_name: str = DEFAULT_NIL_NAME,
                 with_opening_par: bool = DEFAULT_WITH_OPENING_PAR,
                 with_trailing_pars: bool = DEFAULT_WITH_TRAILING_PARS,
                 hash_digest_size: int = DEFAULT_HASH_DIGEST_SIZE):
        self.pars = pars
        self.root_name = root_name
        self.nil_name = nil_name
        self.with_opening_par = with_opening_par
        self.with_trailing_pars = with_trailing_pars
        self.hash_digest_size = hash_digest_size

    def generate_auid_hash_b64(self, cuids: Sequence[str]) -> tuple[str, str]:
        _, _, hashed_b64, _, comp_b64, _ = generate_bp_auid_from_cuids(
            cuids, self.pars, self.root_name, self.nil_name,
            self.with_opening_par, self.with_trailing_pars)
        return comp_b64, hashed_b64

    def cuids_from_auid_b64(self, auid_comp_b64: str) -> list[str]:
        auid = decompress_id_bytes(decode64(auid_comp_b64))
        return list(generate_cuids_from_bp_auid(
            auid, self.pars, self.root_name, self.nil_name,
            self.with_opening_par, self.with_trailing_pars))

    def hash_b64_from_auid(self, auid_comp_b64: str) -> str:
        auid = decompress_id_bytes(decode64(auid_comp_b64))
        return hash_id(auid, self.hash_digest_size)[1]


class RHEALPixAUIDGenerator(AUIDGenerator):
    """Optimizes CUIDs first, so AUIDs are canonical for the area
    (reference auids/rhpx.py:221-254)."""

    def __init__(self, n_side: int, **kw):
        super().__init__(**kw)
        self.n_side = n_side

    def generate_auid_hash_b64(self, cuids: Sequence[str]) -> tuple[str, str]:
        if not is_optimal_cuids(cuids, self.n_side):
            cuids = optimize_cuids(cuids, self.n_side)
        return super().generate_auid_hash_b64(cuids)
