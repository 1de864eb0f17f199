"""Block-sparse (block-ELL) matrix times dense matrix, as a Pallas kernel.

At MSOA scale (M ~ 7000 locations) the commuting coupling ``Cstar @ (I/N)``
(reference hot op: ``/root/reference/covid19uk/model_spec.py:262``) is a
``[M, M] @ [M, T]`` product with a *mostly-zero* ``Cstar``: commuting flows
connect each area to a few dozen neighbours, so at 128x128-block granularity
typical block density is 5-20%.  The dense product is HBM-bound — every
step re-reads 196 MB of zeros at M=7000/f32 — which XLA cannot avoid
because the sparsity is a property of the *values*.  This kernel reads only
the populated blocks.

Format: block-ELL.  The ``[M, M]`` matrix is tiled into ``B x B`` blocks
(B = 128, one MXU tile); each block row stores its ``<= K`` populated blocks
contiguously with their column-block indices, padded to a fixed K with
zero blocks pointing at column 0 (which contribute exactly zero — no masks
needed).  The kernel runs a ``(R, K)`` grid: the output block stays VMEM-
resident across the K minor steps while the pallas pipeline double-buffers
the value blocks and the gathered ``x`` blocks (whose index map reads the
scalar-prefetched column indices).

Differentiation: the two production matrices (``Cstar``, the CAR precision)
are symmetric, so ``d(Ax)/dx`` applied to a cotangent ``g`` is just ``A g``
— the same kernel.  ``from_dense`` asserts symmetry; values are constants
(covariates), their cotangent is zero.

Measured (TPU v5e, M=7168, T=128, f32): see ``tools/bench_block_sparse.py``
output quoted in the repo README.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128  # one f32 MXU tile; also the lane width


def _interpret():
    return jax.default_backend() != "tpu"


def _round_up(x, m):
    return -(-x // m) * m


def _matmul_kernel(cidx_ref, vals_ref, x_ref, o_ref):
    """Grid (R, K): block row i accumulates vals[i, j] @ x[cidx[i, j]]."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(
        vals_ref[0, 0], x_ref[:], preferred_element_type=o_ref.dtype
    )


def _strip_kernel(cidx_ref, vals_ref, x_hbm_ref, o_ref, xbuf, sem):
    """Grid (R[, S]): one step per block ROW, K gathered products inside.

    The (R, K) variant above pays one grid-step launch (~0.8 us measured)
    per 128x128x128 product — launch-bound at production shapes.  Here each
    step does the whole row strip: the K ``x`` blocks are gathered from HBM
    by explicit double-buffered async DMA (indices from the scalar-
    prefetched ``col_idx`` in SMEM), overlapping the MXU products.

    With a trailing batch grid axis (vmapped chains), ``x`` is
    ``[S, RB, Tp]`` in HBM and the DMA source gains the batch index.  The
    batch axis is the MINOR grid axis so the row's value strip keeps the
    same block index across consecutive steps — the pipeline skips the
    re-copy and the A-block HBM traffic is paid once per row, not once per
    (row, chain) (this was why batched BSR lost to dense: x-gather traffic
    scales with nnzb x S either way, but value traffic must not).
    """
    # program_id must be read at kernel top level: inside a pl.when branch
    # it escapes the interpreter's grid substitution.
    i = pl.program_id(0)  # row-grid axis (major)
    s = pl.program_id(1) if x_hbm_ref.ndim == 3 else None
    K = vals_ref.shape[1]
    B = o_ref.shape[-2]

    def get_dma(slot, j):
        if x_hbm_ref.ndim == 3:
            src = x_hbm_ref.at[s, pl.ds(cidx_ref[i, j] * B, B), :]
        else:
            src = x_hbm_ref.at[pl.ds(cidx_ref[i, j] * B, B), :]
        return pltpu.make_async_copy(src, xbuf.at[slot], sem.at[slot])

    get_dma(0, 0).start()
    o_ref[:] = jnp.zeros_like(o_ref)

    def body(j, carry):
        slot = j % 2

        @pl.when(j + 1 < K)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        prod = jnp.dot(
            vals_ref[0, j], xbuf[slot], preferred_element_type=o_ref.dtype
        )
        if o_ref.ndim == 3:
            o_ref[0] += prod
        else:
            o_ref[:] += prod
        return carry

    jax.lax.fori_loop(0, K, body, None)


# Above this many bytes of value blocks per row strip, fall back to the
# (R, K) kernel (the strip variant keeps a whole row's blocks in VMEM).
_STRIP_VMEM_LIMIT = 8 * 1024 * 1024


def _bsr_apply(values, col_idx, xp):
    """Raw kernel call: block-ELL ``values [R,K,B,B] @ xp [(S,) R*B, Tp]``."""
    R, K, B, _ = values.shape
    Tp = xp.shape[-1]
    batched = xp.ndim == 3
    strip_bytes = K * B * B * values.dtype.itemsize
    if strip_bytes <= _STRIP_VMEM_LIMIT:
        if batched:
            S = xp.shape[0]
            grid = (R, S)  # batch minor: value strip stationary per row
            vals_spec = pl.BlockSpec(
                (1, K, B, B), lambda i, s, c: (i, 0, 0, 0)
            )
            out_spec = pl.BlockSpec((1, B, Tp), lambda i, s, c: (s, i, 0))
        else:
            grid = (R,)
            vals_spec = pl.BlockSpec((1, K, B, B), lambda i, c: (i, 0, 0, 0))
            out_spec = pl.BlockSpec((B, Tp), lambda i, c: (i, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                vals_spec,
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((2, B, Tp), xp.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = _strip_kernel
    else:
        if batched:
            S = xp.shape[0]
            grid = (R, S, K)
            in_specs = [
                pl.BlockSpec((1, 1, B, B), lambda i, s, j, c: (i, j, 0, 0)),
                pl.BlockSpec((1, B, Tp), lambda i, s, j, c: (s, c[i, j], 0)),
            ]
            out_spec = pl.BlockSpec(
                (1, B, Tp), lambda i, s, j, c: (s, i, 0)
            )

            def kernel(cidx_ref, vals_ref, x_ref, o_ref):
                @pl.when(pl.program_id(2) == 0)
                def _():
                    o_ref[:] = jnp.zeros_like(o_ref)

                o_ref[0] += jnp.dot(
                    vals_ref[0, 0], x_ref[0],
                    preferred_element_type=o_ref.dtype,
                )

        else:
            grid = (R, K)
            in_specs = [
                pl.BlockSpec((1, 1, B, B), lambda i, j, c: (i, j, 0, 0)),
                pl.BlockSpec((B, Tp), lambda i, j, c: (c[i, j], 0)),
            ]
            out_spec = pl.BlockSpec((B, Tp), lambda i, j, c: (i, 0))
            kernel = _matmul_kernel
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
        )
    out_shape = (
        (xp.shape[0], R * B, Tp) if batched else (R * B, Tp)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, xp.dtype),
        interpret=_interpret(),
    )(col_idx, values, xp)


def _make_partitioned_apply(batched):
    """Wraps the kernel call in a ``custom_partitioning`` SPMD rule.

    Row-partitioned model parallelism for the space-sharded MSOA driver
    (SURVEY.md §2.8): when ``values``/``col_idx`` are sharded along the
    block-row axis (dim 0), each device runs the kernel on its row band
    with ``x`` all-gathered (``col_idx`` holds *global* block-column
    indices, so the local kernel needs the full ``x`` — the partitioner
    inserts the all-gather from the declared shardings alone).  The output
    inherits the row sharding; a batch (chain) axis passes through, giving
    2-D (chain x space) parallelism.  Without a mesh this is the identity
    wrapper.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    if batched:
        rule = "r k b1 b2, r k, s m t -> s (r b1) t"
    else:
        rule = "r k b1 b2, r k, m t -> (r b1) t"

    @custom_partitioning
    def fn(values, col_idx, xp):
        return _bsr_apply(values, col_idx, xp)

    def _specs(mesh, arg_shapes):
        def spec_of(sh):
            s = getattr(sh.sharding, "spec", None)
            return tuple(s) if s is not None else ()

        vspec = spec_of(arg_shapes[0])
        row = vspec[0] if len(vspec) > 0 else None
        xspec = spec_of(arg_shapes[2])
        batch = xspec[0] if batched and len(xspec) > 0 else None
        P = PartitionSpec
        args = (
            NamedSharding(mesh, P(row, None, None, None)),
            NamedSharding(mesh, P(row, None)),
            NamedSharding(
                mesh, P(batch, None, None) if batched else P(None, None)
            ),
        )
        out = NamedSharding(
            mesh, P(batch, row, None) if batched else P(row, None)
        )
        return args, out

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings, out_sharding = _specs(mesh, arg_shapes)

        def lower_fn(values, col_idx, xp):
            return _bsr_apply(values, col_idx, xp)

        return mesh, lower_fn, out_sharding, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        _, out_sharding = _specs(mesh, arg_shapes)
        return out_sharding

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=("k", "b1", "b2", "m"),
    )
    return fn


_bsr_apply_unbatched = None
_bsr_apply_batched = None


def _partitioned_apply(values, col_idx, xp):
    global _bsr_apply_unbatched, _bsr_apply_batched
    if xp.ndim == 3:
        if _bsr_apply_batched is None:
            _bsr_apply_batched = _make_partitioned_apply(batched=True)
        return _bsr_apply_batched(values, col_idx, xp)
    if _bsr_apply_unbatched is None:
        _bsr_apply_unbatched = _make_partitioned_apply(batched=False)
    return _bsr_apply_unbatched(values, col_idx, xp)


def _bsr_matmul_impl(values, col_idx, x):
    """Pad/unpad wrapper over the kernel; x is ``[(S,) M, T]``."""
    R, K, B, _ = values.shape
    n, t = x.shape[-2], x.shape[-1]
    tp = _round_up(max(t, 1), BLOCK)
    lead = x.shape[:-2]
    xp = jnp.zeros(lead + (R * B, tp), x.dtype)
    xp = xp.at[..., :n, :t].set(x)
    return _partitioned_apply(values, col_idx, xp)[..., :n, :t]


@jax.custom_batching.custom_vmap
def _bsr_core(values, col_idx, x):
    """vmap-aware: a chain-vmapped call lowers to ONE kernel launch with a
    leading batch grid axis (values shared across the batch) instead of
    relying on the generic pallas batching rule."""
    return _bsr_matmul_impl(values, col_idx, x)


@_bsr_core.def_vmap
def _bsr_core_vmap_rule(axis_size, in_batched, values, col_idx, x):
    v_b, c_b, x_b = in_batched
    if v_b or c_b:
        raise NotImplementedError(
            "vmap over BlockSparse values/col_idx is not supported "
            "(the matrix is shared across chains)"
        )
    if x.ndim > 3:
        # Nested vmap (e.g. chains over the L-vmapped windowed evaluator):
        # fold this level into the batch axis and RE-ENTER _bsr_core so any
        # remaining outer vmap levels hit this rule again (the primitives
        # inside the impl — custom_partitioning in particular — have no
        # generic batching rule).
        lead = x.shape[: x.ndim - 2]
        flat = _bsr_core(
            values, col_idx, x.reshape((-1,) + x.shape[-2:])
        )
        return flat.reshape(lead + flat.shape[-2:]), True
    # Re-enter _bsr_core (NOT the impl): the rule body is traced under any
    # REMAINING outer batch levels, and only a _bsr_core call lets those
    # levels hit this rule again instead of the un-batchable
    # custom_partitioning primitive inside the impl.
    return _bsr_core(values, col_idx, x), True


# custom_vjp OUTSIDE custom_vmap: reverse-mode AD hits the VJP rule first
# (custom_vmap has no linearization rule), and vmap of the VJP's pieces
# re-enters the custom_vmap rule.
@jax.custom_vjp
def bsr_matmul(values, col_idx, x):
    """``A @ x`` for symmetric block-ELL ``A``; x is ``[(S,) M, T]``."""
    return _bsr_core(values, col_idx, x)


def _bsr_fwd(values, col_idx, x):
    return _bsr_core(values, col_idx, x), (values, col_idx)


def _bsr_bwd(res, g):
    values, col_idx = res
    dx = _bsr_core(values, col_idx, g)  # A symmetric: A^T g = A g
    return (
        jnp.zeros_like(values),
        np.zeros(col_idx.shape, jax.dtypes.float0),
        dx,
    )


bsr_matmul.defvjp(_bsr_fwd, _bsr_bwd)


@jax.tree_util.register_pytree_node_class
class BlockSparse:
    """A symmetric block-sparse (block-ELL) matrix with a Pallas matmul.

    Registered as a pytree (values/col_idx are leaves; the logical size is
    static aux data) so it can ride inside ``ModelData`` through jit/vmap
    boundaries as a program *input* — at MSOA scale the values are tens of
    MB and must not become compiled constants (see CLAUDE.md: the remote-
    compile tunnel rejects >100 MB constant pools).
    """

    def __init__(self, values, col_idx, n, perm=None, inv_perm=None):
        self.values = values  # [R, K, B, B]
        self.col_idx = col_idx  # [R, K] int32
        self.n = n  # logical size (static)
        # Optional symmetric bandwidth-reducing permutation (RCM): block
        # sparsity only exists if nearby locations share block rows, which
        # an arbitrary input ordering destroys — the operator stores
        # ``Pi A Pi^T`` and permutes x in / y out (two [M, T] gathers,
        # negligible next to the saved block reads).
        self.perm = perm  # [n] int32 or None
        self.inv_perm = inv_perm  # [n] int32 or None

    def tree_flatten(self):
        return (self.values, self.col_idx, self.perm, self.inv_perm), (
            self.n,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2], children[3])

    @property
    def block_density(self):
        R, K = self.col_idx.shape
        return R * K / max(1, _round_up(self.n, BLOCK) // BLOCK) ** 2

    @classmethod
    def from_dense(cls, a, dtype=jnp.float32, block=BLOCK, reorder=True,
                   check_symmetric=True):
        """Builds the block-ELL representation of a symmetric dense matrix.

        Host-side, once per model build.  Padded slots carry a zero block at
        column 0, so no in-kernel masking is needed.  The block structure is
        derived from the sparse coordinate list and values are gathered one
        populated block at a time — never materializing a permuted copy of
        the full matrix (this host's page-fault rate makes every fresh
        [M, M] buffer cost ~20 s at MSOA scale).

        Args:
          reorder: apply a reverse-Cuthill-McKee permutation to concentrate
            nonzeros near the diagonal before blocking.  Without it, an
            arbitrary location ordering scatters each area's neighbours
            across all block columns and block density approaches 1.
          check_symmetric: verify symmetry (the VJP relies on A^T = A).
            Callers constructing symmetric matrices by construction can
            skip the two full-matrix temporaries the check costs.
        """
        a = np.asarray(a)
        n = a.shape[0]
        if a.shape != (n, n):
            raise ValueError(f"expected square matrix, got {a.shape}")
        if check_symmetric and not np.allclose(
            a, a.T, rtol=1e-6, atol=1e-12
        ):
            raise ValueError(
                "BlockSparse.from_dense requires a symmetric matrix "
                "(the VJP uses A^T = A)"
            )
        from scipy.sparse import csr_matrix

        S = csr_matrix(a != 0)
        perm = inv_perm = None
        p = None
        if reorder:
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            p = np.asarray(
                reverse_cuthill_mckee(S, symmetric_mode=True)
            ).astype(np.int64)
            inv = np.empty(n, np.int64)
            inv[p] = np.arange(n)
            perm = jnp.asarray(p, jnp.int32)
            inv_perm = jnp.asarray(inv, jnp.int32)
        coo = S.tocoo()
        r = inv[coo.row] if p is not None else coo.row.astype(np.int64)
        c = inv[coo.col] if p is not None else coo.col.astype(np.int64)
        R = _round_up(n, block) // block
        pairs = np.unique((r // block) * R + (c // block))
        pbi, pbj = pairs // R, pairs % R
        K = max(1, int(np.bincount(pbi, minlength=R).max()))
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        values = np.zeros((R, K, block, block), np_dtype)
        col_idx = np.zeros((R, K), np.int32)
        slot = np.zeros(R, np.int32)
        rows_of = p if p is not None else np.arange(n)
        for bi, bj in zip(pbi, pbj):
            s_i = slot[bi]
            slot[bi] += 1
            col_idx[bi, s_i] = bj
            ro = rows_of[bi * block : min((bi + 1) * block, n)]
            co = rows_of[bj * block : min((bj + 1) * block, n)]
            values[bi, s_i, : len(ro), : len(co)] = a[np.ix_(ro, co)]
        return cls(
            jnp.asarray(values), jnp.asarray(col_idx), n, perm, inv_perm
        )

    def matmul(self, x):
        """``A @ x`` with ``x`` of shape ``[M, T]`` or ``[M]``."""
        vec = x.ndim == 1
        if vec:
            x = x[:, None]
        if self.perm is not None:
            x = x[self.perm]
        y = bsr_matmul(self.values, self.col_idx, x)
        if self.inv_perm is not None:
            y = y[self.inv_perm]
        return y[:, 0] if vec else y

    def todense(self):
        """Dense ``[n, n]`` reconstruction (host-side; tests / debugging)."""
        R, K, B, _ = self.values.shape
        vals = np.asarray(self.values)
        cidx = np.asarray(self.col_idx)
        dense = np.zeros((R * B, R * B), vals.dtype)
        for i in range(R):
            for j in range(K):
                dense[
                    i * B : (i + 1) * B,
                    cidx[i, j] * B : (cidx[i, j] + 1) * B,
                ] += vals[i, j]
        dense = dense[: self.n, : self.n]
        if self.inv_perm is not None:
            ip = np.asarray(self.inv_perm)
            dense = dense[np.ix_(ip, ip)]
        return dense
