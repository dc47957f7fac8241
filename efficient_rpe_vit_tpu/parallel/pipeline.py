"""Pipeline parallelism (GPipe-style) over a 'pipe' mesh axis.

The fourth axis of the parallel layer (after data, tensor, and context
parallelism): transformer depth is split into S stages, each device along
'pipe' holds depth/S blocks' parameters, and microbatches flow through the
stage ring via `lax.ppermute` on a static GPipe schedule of M + S - 1
ticks. Everything lives inside one `shard_map` + `lax.scan`, so the whole
pipeline — including the reverse schedule — is a single differentiable XLA
program; reverse-mode AD through the scan replays the ring backwards and
produces exact gradients (tested against the sequential model).

The reference has no pipeline (or any) parallelism (SURVEY.md §2.12);
this is the TPU-native construction: SPMD collective-permute pipelining,
not host-driven stage processes.

Scope notes:
  * parameters are stage-sharded over 'pipe' with a leading [depth] stack
    axis (`stack_block_variables` builds it from a ViT variables tree);
  * embed/head run replicated on every device (they are tiny); the block
    stack is the pipelined region;
  * dropout uses one rng per BLOCK (microbatches share a mask), so
    pipelined training is stochastic-equivalent, not bit-equal, to the
    sequential model when dropout > 0; with deterministic=True outputs
    are bit-comparable.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_variables(variables, depth: int):
    """Stack per-block subtrees into leading-axis pytrees.

    Args:
        variables: ViT variables ({'params': ..., 'constants': ...?}) whose
            params contain block_0..block_{depth-1} of identical structure.
        depth: number of blocks.
    Returns:
        (stacked, rest): `stacked` is {'params': tree, 'constants': tree?}
        with every leaf gaining a leading [depth] axis; `rest` is the
        non-block remainder of the variables (embed/head params etc.).
    """
    stacked: dict = {}
    rest: dict = {}
    for col, tree in variables.items():
        blocks = [tree[f"block_{i}"] for i in range(depth)
                  if f"block_{i}" in tree]
        if blocks:
            stacked[col] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *blocks
            )
        remainder = {k: v for k, v in tree.items()
                     if not k.startswith("block_")}
        if remainder:
            rest[col] = remainder
    return stacked, rest


def pipeline_spec(stacked, axis: str = "pipe", mesh: Optional[Mesh] = None,
                  model_axis: Optional[str] = None):
    """PartitionSpec tree: shard the leading stack axis over `axis`.

    With `mesh` and `model_axis`, each leaf additionally gets the
    Megatron-style tensor-parallel dims from `make_param_specs` (computed
    on the per-block shape, i.e. with the leading [depth] axis dropped,
    then shifted right by one) — the spec a (pipe x model)-sharded stack
    of block weights wants.
    """
    if (mesh is None or model_axis is None
            or model_axis not in mesh.axis_names
            or mesh.shape[model_axis] == 1):
        return jax.tree_util.tree_map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), stacked
        )
    from .mesh import make_param_specs

    class _ShapeView:
        """Shape-only stand-in so make_param_specs' dim-divisibility
        checks see the per-block shape, not the stacked one."""

        def __init__(self, shape):
            self.shape = shape

    views = jax.tree_util.tree_map(
        lambda x: _ShapeView(x.shape[1:]), stacked
    )
    block_specs = make_param_specs(views, mesh, model_axis)
    return jax.tree_util.tree_map(
        lambda x, bs: P(axis, *bs, *([None] * (x.ndim - 1 - len(bs)))),
        stacked, block_specs,
        is_leaf=lambda t: hasattr(t, "shape"),
    )


def pipeline_blocks(
    block_apply: Callable[[Any, Any, jnp.ndarray], jnp.ndarray],
    stacked_vars,
    rngs,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: Optional[int] = None,
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = "model",
):
    """Run a stack of transformer blocks as a GPipe pipeline.

    Composes with data parallelism: when the mesh also has `data_axis`,
    each microbatch's batch dim is sharded across it — a (data=2, pipe=4)
    mesh runs 2-way batch-parallel GPipe (each data row pipelines HALF the
    batch through its own stage ring) instead of every data row redundantly
    computing the full batch (VERDICT r2 weak #4).

    Composes with tensor parallelism: when the mesh also has `model_axis`,
    the shard_map stays MANUAL over the pipe/data axes but leaves
    `model_axis` AUTO — inside each stage, XLA GSPMD shards the block
    matmuls from the Megatron-style weight shardings (pipeline_spec's
    make_param_specs dims) and inserts the TP collectives itself, exactly
    as the non-pipelined `make_parallel_train_step` path does. A
    (data=2, pipe=2, model=2) mesh therefore runs batch-parallel GPipe
    with head/hidden-split stages: full 3D DP x PP x TP.

    Args:
        block_apply: (block_vars, rng, h) -> h for ONE block, where
            block_vars is one depth-slice of `stacked_vars` and rng is one
            row of `rngs` (ignored in deterministic mode).
        stacked_vars: pytree with leading [depth] axis (stack_block_variables).
        rngs: [depth, 2] uint32 PRNG keys (one per block), or None.
        x: [B, N, C] activations entering the block stack.
        mesh: mesh containing `axis` (S = mesh.shape[axis] stages).
        n_microbatches: M; defaults to S. B % M == 0, depth % S == 0.
        data_axis: name of the batch-sharding mesh axis, if present.
    Returns:
        [B, N, C], equal to applying the blocks sequentially.
    """
    S = mesh.shape[axis]
    depth = jax.tree_util.tree_leaves(stacked_vars)[0].shape[0]
    if depth % S != 0:
        raise ValueError(f"depth {depth} not divisible by {S} stages")
    M = n_microbatches or S
    B = x.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    d = (mesh.shape[data_axis]
         if data_axis is not None and data_axis in mesh.axis_names else 1)
    if mb % d != 0:
        d = 1  # microbatch doesn't divide: degrade to replicated batch
               # (correctness first, like make_param_specs' fallback)
    if rngs is None:
        rngs = jnp.zeros((depth, 2), jnp.uint32)

    x_mb = x.reshape(M, mb, *x.shape[1:])
    # schedule inputs: M real microbatches + S-1 drain ticks
    xs_sched = jnp.concatenate(
        [x_mb, jnp.zeros((S - 1, mb) + x.shape[1:], x.dtype)], axis=0
    )

    def body(local_vars, local_rngs, xs):
        if d > 1:
            # Stage params come in data-invariant (replicated over 'data')
            # while the activations are data-varying; the scan's AD
            # transpose then carries param cotangents whose varying axes
            # flip mid-scan. Cast the params to data-varying up front: the
            # compute is unchanged and the pcast's own transpose is a psum
            # over 'data' — precisely the DP gradient all-reduce.
            local_vars = jax.tree_util.tree_map(
                lambda t: jax.lax.pcast(t, data_axis, to="varying"),
                local_vars,
            )
            local_rngs = jax.lax.pcast(local_rngs, data_axis, to="varying")
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        if tp_block_specs is not None:
            ctx_mesh = jax.sharding.get_abstract_mesh()
            tp_shardings = jax.tree_util.tree_map(
                lambda s: NamedSharding(ctx_mesh, s), tp_block_specs,
                is_leaf=lambda x: isinstance(x, P),
            )
        else:
            tp_shardings = None

        def run_stage(h):
            def blk(h, sl):
                v, r = sl
                if tp_shardings is not None:
                    v = jax.tree_util.tree_map(
                        jax.lax.with_sharding_constraint, v, tp_shardings,
                        is_leaf=lambda x: hasattr(x, "shape"),
                    )
                return block_apply(v, r, h), None

            h, _ = jax.lax.scan(blk, h, (local_vars, local_rngs))
            return h

        def step(recv, x_t):
            h_in = jnp.where(is_first, x_t, recv)
            h_out = run_stage(h_in)
            sent = jax.lax.ppermute(h_out, axis, perm)
            return sent, h_out

        # the carry is device-varying (each stage holds different data), so
        # the invariant zeros initial value must be cast to 'varying'
        init = jax.lax.pcast(jnp.zeros_like(xs[0]), (axis,), to="varying")
        _, ys = jax.lax.scan(step, init, xs)
        # last stage emits microbatch m at tick m + S - 1
        outs = jax.lax.dynamic_slice_in_dim(ys, S - 1, M, axis=0)
        outs = jnp.where(is_last, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)  # broadcast result to all stages

    t = (mesh.shape[model_axis]
         if model_axis is not None and model_axis in mesh.axis_names else 1)
    # in_specs may only mention MANUAL axes; the tensor-parallel 'model'
    # dims ride on the operands themselves (device_put below) and GSPMD
    # propagates them through the stage compute.
    v_spec = pipeline_spec(stacked_vars, axis)
    v_put_spec = pipeline_spec(stacked_vars, axis, mesh=mesh,
                               model_axis=model_axis if t > 1 else None)
    # Per-block TP constraint tree (the stacked spec minus the consumed
    # leading pipe dim), re-pinned INSIDE the stage scan: the scan's
    # dynamic-slice otherwise drops the weight shardings and GSPMD
    # all-gathers the weights instead of sharding the stage matmuls.
    # The NamedShardings must be built over the BODY's context mesh
    # (manual-typed data/pipe axes), so they're resolved inside `body`.
    tp_block_specs = (
        jax.tree_util.tree_map(
            lambda s: P(*tuple(s)[1:]), v_put_spec,
            is_leaf=lambda x: isinstance(x, P),
        )
        if t > 1 else None
    )
    # microbatch batch dim sharded over 'data' (replicated when absent):
    # each data row holds mb/d samples of every schedule tick. Stage params
    # are unsheared over 'data', so shard_map's AD transposes their
    # cotangents with a psum over 'data' — the DP gradient all-reduce comes
    # for free.
    xs_spec = P(None, data_axis) if d > 1 else P()
    # manual over every axis except 'model', which stays AUTO so GSPMD
    # inserts the Megatron TP collectives inside each stage (default
    # frozenset() = fully manual, the TP-less behavior).
    manual_axes = (
        frozenset(a for a in mesh.axis_names if a != model_axis)
        if t > 1 else frozenset()
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(v_spec, P(axis, None), xs_spec),
        out_specs=xs_spec,
        axis_names=manual_axes,
    )
    put = lambda t, s: jax.device_put(t, NamedSharding(mesh, s))
    stacked_vars = jax.tree_util.tree_map(
        lambda leaf, s: put(leaf, s), stacked_vars, v_put_spec,
        is_leaf=lambda leaf: hasattr(leaf, "shape"),
    )
    outs = fn(stacked_vars, put(rngs, P(axis, None)), put(xs_sched, xs_spec))
    return outs.reshape(B, *x.shape[1:])


# ─── ViT glue: embed / head as pure functions over the params tree ────────
# Mirrors vit.py's forward exactly (patchify -> Dense -> CLS -> +pos, and
# fp32 LayerNorm -> Dense head); pinned to the module by the equality test
# in tests/test_pipeline.py so any drift in vit.py fails loudly.

def vit_embed(params, x, patch_size: int, dtype=jnp.float32):
    from ..models.vit import patchify

    B = x.shape[0]
    h = patchify(x, patch_size).astype(dtype)
    pe = params["patch_embedding"]
    h = h @ pe["kernel"].astype(dtype) + pe["bias"].astype(dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (B, 1, h.shape[-1]))
    h = jnp.concatenate([cls, h], axis=1)
    return h + params["pos_embedding"].astype(dtype)


def vit_head(params, h):
    cls = h[:, 0].astype(jnp.float32)
    ln = params["head_norm"]
    mean = jnp.mean(cls, axis=-1, keepdims=True)
    var = jnp.var(cls, axis=-1, keepdims=True)
    cls = (cls - mean) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]
    hd = params["head"]
    return cls @ hd["kernel"] + hd["bias"]


def make_block_apply(model, deterministic: bool = True):
    """block_apply closure for `pipeline_blocks` built from a ViT module:
    applies ONE TransformerBlock given its stacked-slice variables."""
    from ..models.layers import TransformerBlock

    block = TransformerBlock(
        dim=model.dim,
        heads=model.heads,
        mlp_dim=model.mlp_dim,
        num_patches=model.num_patches + 1,
        dropout=model.dropout,
        attention_type=model.attention_type,
        rpe_type=model.rpe_type,
        attention_kwargs=model.attention_kwargs,
        rpe_kwargs=model.rpe_kwargs,
        mlp_type=model.mlp_type,
        mlp_kwargs=model.mlp_kwargs,
        dtype=model.dtype,
    )

    def block_apply(block_vars, rng, h):
        variables = {"params": block_vars["params"]}
        if "constants" in block_vars:
            variables["constants"] = block_vars["constants"]
        rngs = None if deterministic else {"dropout": rng}
        return block.apply(variables, h, deterministic=deterministic,
                           rngs=rngs)

    return block_apply


def pipeline_vit_forward(model, variables, x, mesh, axis: str = "pipe",
                         n_microbatches: Optional[int] = None,
                         deterministic: bool = True, rng=None,
                         data_axis: Optional[str] = "data",
                         model_axis: Optional[str] = "model"):
    """Full ViT forward with the block stack pipelined over `axis`.

    Embed and head run replicated module-wise but batch-sharded over
    `data_axis` when the mesh has one (DP x PP); stages are additionally
    tensor-parallel over `model_axis` when the mesh has one (DP x PP x TP);
    numerically equal to `model.apply(variables, x, deterministic=True)`
    when deterministic.
    """
    stacked, rest = stack_block_variables(variables, model.depth)
    rngs = None
    if not deterministic and rng is not None:
        rngs = jax.random.split(rng, model.depth)
    h = vit_embed(rest["params"], x, model.patch_size,
                  jnp.dtype(model.dtype))
    h = pipeline_blocks(
        make_block_apply(model, deterministic), stacked, rngs, h, mesh,
        axis=axis, n_microbatches=n_microbatches, data_axis=data_axis,
        model_axis=model_axis,
    )
    return vit_head(rest["params"], h)


def make_pipeline_train_step(model, mesh, axis: str = "pipe",
                             n_microbatches: Optional[int] = None,
                             data_axis: Optional[str] = "data",
                             model_axis: Optional[str] = "model",
                             state_specs=None,
                             grad_accum: int = 1):
    """Jitted train step with the block stack pipeline-parallel over `axis`.

    Same (state, images, labels, rng) -> (state, loss, correct) contract as
    `make_parallel_train_step`; the backward runs the reverse GPipe
    schedule automatically (lax.scan + ppermute transpose). `grad_accum`
    > 1 composes microbatch gradient accumulation with the pipeline: the
    global batch reshapes to [A, B/A, ...] and an outer lax.scan runs each
    chunk through the full GPipe forward/backward — chunks still sharded
    over `data_axis` and pipelined over `axis` — accumulating the mean
    gradient before ONE optimizer update (grad-accum x PP). Parameters
    live un-stacked in the TrainState — stacking happens inside the jitted
    step (a transpose, free under XLA) so the optimizer and checkpointing
    see the ordinary per-block tree. On a mesh with `data_axis`, the batch
    inputs are sharded across it and the pipeline runs batch-parallel
    (DP x PP); the stage-parameter gradients all-reduce over 'data' via
    the shard_map transpose. On a mesh with `model_axis`, the stages run
    tensor-parallel as well (DP x PP x TP) — pass `state_specs` (the spec
    TrainState from `create_sharded_train_state`) so the un-stacked params
    and optimizer state live model-sharded between steps instead of being
    re-scattered from replicas every step.
    """
    from ..train.training import cross_entropy_loss

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    has_data = (data_axis is not None and data_axis in mesh.axis_names
                and mesh.shape[data_axis] > 1)
    data_sharding = NamedSharding(mesh, P(data_axis) if has_data else P())
    repl = NamedSharding(mesh, P())

    if state_specs is not None:
        state_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), state_specs,
            is_leaf=lambda x: isinstance(x, P),
        )
    else:
        state_shardings = repl

    @functools.partial(
        jax.jit,
        in_shardings=(state_shardings, data_sharding, data_sharding, repl),
        out_shardings=(state_shardings, repl, repl),
    )
    def step(state, images, labels, rng):
        def loss_fn(params, x, y, key):
            variables = {"params": params}
            if state.constants is not None:
                variables["constants"] = state.constants
            logits = pipeline_vit_forward(
                model, variables, x, mesh, axis=axis,
                n_microbatches=n_microbatches,
                deterministic=False, rng=key, data_axis=data_axis,
                model_axis=model_axis,
            )
            return cross_entropy_loss(logits, y), logits

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if grad_accum > 1:
            b = images.shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum {grad_accum}")
            mb = b // grad_accum
            xs = (
                images.reshape(grad_accum, mb, *images.shape[1:]),
                labels.reshape(grad_accum, mb),
                jnp.arange(grad_accum),
            )

            def body(carry, inp):
                gsum, lsum, csum = carry
                x, y, i = inp
                (loss, logits), grads = grad_fn(
                    state.params, x, y, jax.random.fold_in(rng, i))
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                csum = csum + jnp.sum(jnp.argmax(logits, -1) == y)
                return (gsum, lsum + loss, csum), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            init = (zeros, jnp.zeros((), jnp.float32),
                    jnp.zeros((), jnp.int32))
            (gsum, lsum, correct), _ = jax.lax.scan(body, init, xs)
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            return state.apply_gradients(grads), lsum / grad_accum, correct

        (loss, logits), grads = grad_fn(state.params, images, labels, rng)
        new_state = state.apply_gradients(grads)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return new_state, loss, correct

    return step
