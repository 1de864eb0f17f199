"""Symmetric block-tridiagonal operator for RCM-banded sparse matrices.

Built for the CAR spatial-prior precision ``Dw - rho*W`` (reference
``model_spec.py:171-186``): an adjacency-sparse matrix that RCM reordering
makes *banded* (bandwidth ~ sqrt(M) for planar-ish geography graphs).  The
prior is evaluated once per leapfrog step, on a VECTOR — the block-ELL
Pallas kernel (``ops/pallas/block_sparse.py``) pads that 1-column product
to the 128-lane tile and wastes 128x MXU work, which measured ~5 ms/step
of the MSOA HMC wall.  Here the banded matrix is stored as dense diagonal
+ super-diagonal blocks and the quadratic form is two batched ``[nb,s,s] @
[nb,s]`` matmuls — no gathers, no scatters, no padding waste, clean AD.

Block-tridiagonal validity: with block size ``s >= bandwidth``, every
nonzero ``(i, j)`` with ``|i - j| <= bandwidth`` lands in a diagonal or
adjacent block.  The permutation in/out is a pure permutation, so its VJP
is the inverse gather (declared via custom_vjp — XLA's generic gather VJP
is a scatter-add).
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def _permute(x, perm, inv_perm):
    return x[perm]


def _permute_fwd(x, perm, inv_perm):
    return x[perm], (perm, inv_perm)


def _permute_bwd(res, g):
    perm, inv_perm = res
    # transpose of a permutation gather is the inverse permutation gather
    return g[inv_perm], None, None


_permute.defvjp(_permute_fwd, _permute_bwd)


@jax.tree_util.register_pytree_node_class
class BandedSym:
    """A symmetric banded matrix in block-tridiagonal form.

    Attributes:
      diag: ``[nb, s, s]`` diagonal blocks (of the RCM-permuted matrix).
      upper: ``[nb-1, s, s]`` super-diagonal blocks (lower = transpose).
      perm / inv_perm: ``[n]`` RCM permutation and its inverse (int32).
      n: logical size (static).
    """

    def __init__(self, diag, upper, perm, inv_perm, n):
        self.diag = diag
        self.upper = upper
        self.perm = perm
        self.inv_perm = inv_perm
        self.n = n

    def tree_flatten(self):
        return (self.diag, self.upper, self.perm, self.inv_perm), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @classmethod
    def from_dense(cls, a, dtype=jnp.float32, block=128, max_bandwidth=2048):
        """Builds the banded form of a symmetric sparse matrix (host-side).

        Returns None if the RCM bandwidth exceeds ``max_bandwidth`` (the
        banded form would be mostly zeros — fall back to another operator).
        Never materializes a permuted dense copy (this host pays ~20 s per
        fresh [M, M] buffer at MSOA scale): blocks are gathered via
        ``np.ix_`` on the original array.
        """
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = np.asarray(a)
        n = a.shape[0]
        S = csr_matrix(a != 0)
        p = np.asarray(
            reverse_cuthill_mckee(S, symmetric_mode=True)
        ).astype(np.int64)
        inv = np.empty(n, np.int64)
        inv[p] = np.arange(n)
        coo = S.tocoo()
        bw = int(np.abs(inv[coo.row] - inv[coo.col]).max()) if coo.nnz else 0
        if bw > max_bandwidth:
            return None
        s = max(block, -(-(bw + 1) // block) * block)
        nb = -(-n // s)
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        diag = np.zeros((nb, s, s), np_dtype)
        upper = np.zeros((max(nb - 1, 0), s, s), np_dtype)
        for i in range(nb):
            ri = p[i * s : min((i + 1) * s, n)]
            diag[i, : len(ri), : len(ri)] = a[np.ix_(ri, ri)]
            if i + 1 < nb:
                rj = p[(i + 1) * s : min((i + 2) * s, n)]
                upper[i, : len(ri), : len(rj)] = a[np.ix_(ri, rj)]
        return cls(
            jnp.asarray(diag),
            jnp.asarray(upper),
            jnp.asarray(p, jnp.int32),
            jnp.asarray(inv, jnp.int32),
            n,
        )

    def _blocked(self, x):
        """Permutes and pads ``x [n]`` into ``[nb, s]`` blocks."""
        nb, s, _ = self.diag.shape
        xp = _permute(x, self.perm, self.inv_perm)
        pad = nb * s - self.n
        if pad:
            xp = jnp.concatenate([xp, jnp.zeros((pad,), xp.dtype)])
        return xp.reshape(nb, s)

    def matvec(self, x):
        """``A @ x`` for ``x [n]``."""
        nb, s, _ = self.diag.shape
        xs = self._blocked(x)
        y = jnp.einsum("nij,nj->ni", self.diag, xs)
        if nb > 1:
            y = y.at[:-1].add(jnp.einsum("nij,nj->ni", self.upper, xs[1:]))
            y = y.at[1:].add(jnp.einsum("nji,nj->ni", self.upper, xs[:-1]))
        return _permute(y.reshape(-1)[: self.n], self.inv_perm, self.perm)

    def quad(self, x):
        """Quadratic form ``x' A x`` for ``x [n]`` — the CAR-prior hot op."""
        nb, s, _ = self.diag.shape
        xs = self._blocked(x)
        q = jnp.sum(xs * jnp.einsum("nij,nj->ni", self.diag, xs))
        if nb > 1:
            q = q + 2.0 * jnp.sum(
                xs[:-1] * jnp.einsum("nij,nj->ni", self.upper, xs[1:])
            )
        return q

    def todense(self):
        """Dense reconstruction (host-side; tests/debugging)."""
        nb, s, _ = self.diag.shape
        d = np.zeros((nb * s, nb * s), np.asarray(self.diag).dtype)
        for i in range(nb):
            d[i * s : (i + 1) * s, i * s : (i + 1) * s] = self.diag[i]
            if i + 1 < nb:
                u = np.asarray(self.upper[i])
                d[i * s : (i + 1) * s, (i + 1) * s : (i + 2) * s] = u
                d[(i + 1) * s : (i + 2) * s, i * s : (i + 1) * s] = u.T
        d = d[: self.n, : self.n]
        ip = np.asarray(self.inv_perm)
        return d[np.ix_(ip, ip)]
