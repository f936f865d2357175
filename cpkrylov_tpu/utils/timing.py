"""Honest device timing helpers.

``jax.Array.block_until_ready()`` is a no-op on some experimental remote
backends (measured on the axon TPU tunnel: a 512 MB x 20-op chain "blocks"
in 0.5 ms while the actual execution+fetch takes seconds).  The only robust
completion barrier is demanding bytes on the host.  ``sync`` fetches a
single element (dispatching a tiny slice computation so the transfer is
O(1) bytes, not the whole array), which forces the entire dependency chain
to execute.

Every wall-clock measurement in the benchmarks ends with ``sync``; see
bench.py for the marginal-chain methodology that amortizes the ~35-40 ms
round-trip latency this fetch costs on tunneled backends.
"""
from __future__ import annotations

import numpy as np


def sync(*arrays) -> None:
    """Force completion of all computations the given arrays depend on."""
    import jax

    for x in arrays:
        if x is None:
            continue
        x = jax.tree_util.tree_leaves(x)
        for leaf in x:
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
            # Remote/tunneled backends (axon) only guarantee completion on a
            # host fetch; one element is enough to pin the whole chain.
            if hasattr(leaf, "ndim"):
                head = leaf if leaf.ndim == 0 else leaf.reshape(-1)[:1]
                np.asarray(jax.device_get(head))
