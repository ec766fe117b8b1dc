"""Run-length offset mapping between a transformed text B and its
source A — the reference's OffsetMap analogue (reference:
internal/offsetmap.{h,cc}: Copy/Insert/Delete runs, composable,
used to report detected spans in ORIGINAL buffer offsets,
getonescriptspan.cc:1076-1078).

Implementation: ops accumulate as (kind, n) runs; ``freeze`` converts
them to cumulative numpy boundary arrays so ``to_original`` is one
``searchsorted`` per query batch (vectorized, no per-position loop).
"""

from __future__ import annotations

import numpy as np

COPY, INSERT, DELETE = 0, 1, 2


class OffsetMap:
    """Builds A->B edit runs; maps B (output) positions back to A."""

    def __init__(self):
        self._ops: list[tuple[int, int]] = []
        self._frozen = None

    # -- building ----------------------------------------------------------

    def _push(self, kind: int, n: int) -> None:
        if n <= 0:
            return
        if self._ops and self._ops[-1][0] == kind:
            self._ops[-1] = (kind, self._ops[-1][1] + n)
        else:
            self._ops.append((kind, n))
        self._frozen = None

    def copy(self, n: int) -> None:
        """n bytes of A copied verbatim into B."""
        self._push(COPY, n)

    def insert(self, n: int) -> None:
        """n bytes appear in B with no counterpart in A."""
        self._push(INSERT, n)

    def delete(self, n: int) -> None:
        """n bytes of A dropped from B."""
        self._push(DELETE, n)

    # -- querying ----------------------------------------------------------

    def _freeze(self):
        if self._frozen is None:
            kinds = np.array([k for k, _ in self._ops], dtype=np.int8)
            ns = np.array([n for _, n in self._ops], dtype=np.int64)
            b_len = np.where(kinds == DELETE, 0, ns)
            a_len = np.where(kinds == INSERT, 0, ns)
            b_bounds = np.cumsum(b_len)
            a_starts = np.concatenate([[0], np.cumsum(a_len)[:-1]])
            self._frozen = (b_bounds, a_starts, kinds)
        return self._frozen

    def to_original(self, positions) -> np.ndarray:
        """Map B positions (array-like) -> A positions. Exclusive end
        positions map monotonically, so [start, end) ranges stay valid."""
        b_bounds, a_starts, kinds = self._freeze()
        p = np.asarray(positions, dtype=np.int64)
        if len(b_bounds) == 0:
            return p.copy()
        run = np.searchsorted(b_bounds, p, side="right")
        run = np.minimum(run, len(b_bounds) - 1)
        b_starts = np.concatenate([[0], b_bounds[:-1]])
        within = p - b_starts[run]
        is_copy = kinds[run] == COPY
        out = a_starts[run] + np.where(is_copy, within, 0)
        # positions exactly at/after the end of B clamp to A's end
        total_b = b_bounds[-1]
        total_a = a_starts[-1] + (0 if kinds[-1] == INSERT
                                  else int(self._ops[-1][1]))
        out = np.where(p >= total_b, total_a, out)
        return out

    def compose(self, inner: "OffsetMap") -> "ComposedMap":
        """self: A->B map, inner: B->C map; returns a C->A mapper —
        the reference's offset-map composition (offsetmap.cc
        ComposeOffsets analogue, query-side)."""
        return ComposedMap(self, inner)


class ComposedMap:
    """Maps positions in C back through B to A."""

    def __init__(self, outer: OffsetMap, inner: OffsetMap):
        self.outer = outer
        self.inner = inner

    def to_original(self, positions) -> np.ndarray:
        return self.outer.to_original(self.inner.to_original(positions))
