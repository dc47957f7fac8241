"""Sharded (data x model)-parallel training step.

jit-over-Mesh with explicit in/out shardings: the batch is split across the
'data' axis, parameters/optimizer state follow `make_param_specs` (replicated
across 'data', head/hidden-split across 'model'), and XLA inserts the
gradient all-reduce over 'data' plus the Megatron-style per-block collectives
over 'model' from the annotations alone — no hand-written psum.

This is the TPU-native equivalent of what NCCL DDP (+ megatron TP) would
have been in the reference had it scaled past one device (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.training import (
    TrainState,
    create_train_state,
    make_micro_loss,
)
from .mesh import batch_spec, make_param_specs, shard_pytree


def _state_specs(state: TrainState, mesh: Mesh, fsdp_axis: str = None):
    """PartitionSpec tree matching a TrainState. `fsdp_axis` (e.g. 'data')
    additionally ZeRO-shards params/moments/EMA over that axis — the
    opt-state and EMA trees mirror the param specs leaf-for-leaf, so the
    whole optimizer state scatters with them."""
    param_specs = make_param_specs(state.params, mesh, fsdp_axis=fsdp_axis)

    # optax moments mirror the params TREE (adam mu/nu etc.), so match by
    # tree structure, not leaf shape: any opt_state subtree whose structure
    # and leaf shapes equal the params tree gets the params' spec tree
    # leaf-for-leaf; everything else (counts, scalars, empty states)
    # replicates. A shape-based heuristic would silently give an optimizer
    # moment the WRONG spec whenever two params share a shape but not a
    # spec (e.g. a square dim x dim column- vs row-split kernel pair).
    params_treedef = jax.tree_util.tree_structure(state.params)
    param_leaves = jax.tree_util.tree_leaves(state.params)

    def is_params_like(node):
        try:
            if jax.tree_util.tree_structure(node) != params_treedef:
                return False
        except Exception:
            return False
        leaves = jax.tree_util.tree_leaves(node)
        return all(
            getattr(x, "shape", None) == p.shape
            for x, p in zip(leaves, param_leaves)
        )

    def node_spec(node):
        if is_params_like(node):
            return param_specs
        return jax.tree_util.tree_map(lambda _: P(), node)

    opt_specs = jax.tree_util.tree_map(
        node_spec, state.opt_state, is_leaf=is_params_like
    )
    # constants (omega buffers) use the same path rules as params, so
    # head-structured buffers split across 'model' like their parameters
    # (and scatter over the fsdp axis with them)
    const_specs = (
        make_param_specs(state.constants, mesh, fsdp_axis=fsdp_axis)
        if state.constants is not None
        else None
    )
    mstate_specs = (
        jax.tree_util.tree_map(lambda x: P(), state.mutable_state)
        if state.mutable_state is not None
        else None
    )
    return state.replace(
        step=P(),
        params=param_specs,
        opt_state=opt_specs,
        constants=const_specs,
        mutable_state=mstate_specs,
        # the EMA shadow mirrors the params tree, spec-for-spec
        ema_params=(param_specs if state.ema_params is not None else None),
    )


def create_sharded_train_state(
    model, config, rng, sample_input, mesh: Mesh, steps_per_epoch: int = 100,
    ema_decay: float = 0.0, fsdp: bool = False, fsdp_axis: str = "data",
) -> Tuple[TrainState, TrainState]:
    """Initialise a TrainState and place it on the mesh.

    `fsdp=True` ZeRO-shards parameters, Adam moments and the EMA shadow
    over `fsdp_axis` (VERDICT r4 #6): each leaf's largest divisible dim
    scatters across the data axis, XLA all-gathers params at use and
    reduce-scatters gradients — per-device state bytes shrink ~n_data-fold
    (asserted by tests/test_parallel.py). Composes with Megatron TP: a
    leaf can be P('data', 'model')-sharded on both axes.

    Returns (state, state_specs) where specs is the PartitionSpec pytree
    used for the jitted step's in/out shardings.
    """
    state = create_train_state(
        model, config, rng, sample_input, steps_per_epoch=steps_per_epoch,
        ema_decay=ema_decay,
    )
    specs = _state_specs(state, mesh, fsdp_axis=fsdp_axis if fsdp else None)

    def put(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    state = state.replace(
        step=put(state.step, P()),
        params=jax.tree_util.tree_map(put, state.params, specs.params),
        opt_state=jax.tree_util.tree_map(put, state.opt_state, specs.opt_state),
        constants=(
            jax.tree_util.tree_map(put, state.constants, specs.constants)
            if state.constants is not None
            else None
        ),
        mutable_state=(
            jax.tree_util.tree_map(put, state.mutable_state,
                                   specs.mutable_state)
            if state.mutable_state is not None
            else None
        ),
        ema_params=(
            jax.tree_util.tree_map(put, state.ema_params, specs.ema_params)
            if state.ema_params is not None
            else None
        ),
    )
    return state, specs


def make_parallel_train_step(model, mesh: Mesh, specs: TrainState,
                             donate: bool = True,
                             label_smoothing: float = 0.0,
                             grad_accum: int = 1) -> Callable:
    """Build the sharded jitted train step.

    Signature: (state, images [B_global, H, W, C], labels [B_global],
    dropout_key) -> (state, loss, correct). B_global must divide by the
    'data' axis size.

    `grad_accum` > 1 composes microbatch accumulation with the mesh: the
    global batch reshapes to [A, B/A, ...] and a lax.scan runs each
    microbatch — still sharded over 'data' — accumulating the mean
    gradient before ONE optimizer update. Per-device activation memory
    scales with B/(A * n_data).
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    data_sharding = NamedSharding(mesh, batch_spec())
    repl = NamedSharding(mesh, P())

    def to_shardings(spec_tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), spec_tree,
            is_leaf=lambda x: isinstance(x, P),
        )

    state_shardings = TrainState(
        step=repl,
        params=to_shardings(specs.params),
        opt_state=to_shardings(specs.opt_state),
        tx=specs.tx,
        constants=(
            to_shardings(specs.constants) if specs.constants is not None else None
        ),
        mutable_state=(
            to_shardings(specs.mutable_state)
            if specs.mutable_state is not None else None
        ),
        ema_params=(
            to_shardings(specs.ema_params)
            if specs.ema_params is not None else None
        ),
        ema_decay=specs.ema_decay,
    )

    # the shared loss closure keeps redraw/rng/smoothing semantics
    # identical to the single-device steps (training.py::make_micro_loss)
    grad_fn = jax.value_and_grad(
        make_micro_loss(model, label_smoothing), has_aux=True)

    def step_fn(state: TrainState, images, labels, dropout_key):
        redraw_mode = state.mutable_state is not None

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
                gsum, lsum, csum, constants, mstate = carry
                x, y, i = inp
                key = jax.random.fold_in(dropout_key, i)
                (loss, (correct, updates)), grads = grad_fn(
                    state.params, constants, mstate, x, y, key)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                if updates is not None:
                    constants = updates.get("constants", constants)
                    mstate = updates.get("state", mstate)
                return (gsum, lsum + loss, csum + correct, constants,
                        mstate), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            init = (zeros, jnp.zeros((), jnp.float32),
                    jnp.zeros((), jnp.int32), state.constants,
                    state.mutable_state)
            (gsum, lsum, correct, constants, mstate), _ = jax.lax.scan(
                body, init, xs)
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            new_state = state.apply_gradients(grads)
            if redraw_mode:
                new_state = new_state.replace(
                    constants=constants, mutable_state=mstate)
            return new_state, lsum / grad_accum, correct

        (loss, (correct, updates)), grads = grad_fn(
            state.params, state.constants, state.mutable_state,
            images, labels, dropout_key)
        new_state = state.apply_gradients(grads)
        if redraw_mode:
            new_state = new_state.replace(
                constants=updates.get("constants", new_state.constants),
                mutable_state=updates.get("state", new_state.mutable_state),
            )
        return new_state, loss, correct

    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, data_sharding, data_sharding, repl),
        out_shardings=(state_shardings, repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_multi_step(model, mesh: Mesh, specs: TrainState,
                             donate: bool = True,
                             label_smoothing: float = 0.0) -> Callable:
    """K sharded optimizer steps in ONE jitted program (fused dispatch x
    data/model parallelism — the mesh analogue of
    training.py::make_multi_step).

    Signature: (state, images [K, B_global, ...], labels [K, B_global],
    dropout_key) -> (state, losses [K], corrects [K]). The stacked batch
    axes shard as P(None, 'data', ...): every device scans its own batch
    shard through all K steps, and XLA inserts the per-step gradient
    all-reduce over 'data' inside the scan body from the annotations
    alone. Bit-equal to K calls of the `make_parallel_train_step` step
    with keys `fold_in(dropout_key, i)` (tests/test_parallel.py).
    """
    bspec = batch_spec()
    stacked_sharding = NamedSharding(mesh, P(None, *bspec))
    repl = NamedSharding(mesh, P())

    def to_shardings(spec_tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), spec_tree,
            is_leaf=lambda x: isinstance(x, P),
        )

    state_shardings = TrainState(
        step=repl,
        params=to_shardings(specs.params),
        opt_state=to_shardings(specs.opt_state),
        tx=specs.tx,
        constants=(
            to_shardings(specs.constants) if specs.constants is not None
            else None
        ),
        mutable_state=(
            to_shardings(specs.mutable_state)
            if specs.mutable_state is not None else None
        ),
        ema_params=(
            to_shardings(specs.ema_params)
            if specs.ema_params is not None else None
        ),
        ema_decay=specs.ema_decay,
    )
    grad_fn = jax.value_and_grad(
        make_micro_loss(model, label_smoothing), has_aux=True)

    def multi_fn(state: TrainState, images, labels, dropout_key):
        k = images.shape[0]
        redraw_mode = state.mutable_state is not None

        def body(st, inp):
            x, y, i = inp
            key = jax.random.fold_in(dropout_key, i)
            (loss, (correct, updates)), grads = grad_fn(
                st.params, st.constants, st.mutable_state, x, y, key)
            st = st.apply_gradients(grads)
            if redraw_mode:
                st = st.replace(
                    constants=updates.get("constants", st.constants),
                    mutable_state=updates.get("state", st.mutable_state),
                )
            return st, (loss, correct)

        state, (losses, corrects) = jax.lax.scan(
            body, state, (images, labels, jnp.arange(k)))
        return state, losses, corrects

    return jax.jit(
        multi_fn,
        in_shardings=(state_shardings, stacked_sharding,
                      NamedSharding(mesh, P(None, *bspec)), repl),
        out_shardings=(state_shardings, repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def parallel_train_epoch(
    state: TrainState,
    train_step: Callable,
    dataset,
    rng,
    mesh: Mesh,
    multi_step: Callable = None,
    fused_steps: int = 1,
) -> Tuple[TrainState, Dict[str, float]]:
    """One epoch with the sharded step; dataset batches are placed with the
    batch sharding so each device reads only its shard.

    Pass `multi_step` (from `make_parallel_multi_step`) and
    `fused_steps=K` to dispatch in K-step fused chunks (same buffering
    semantics as training.py::train_epoch).

    Multi-host (jax.process_count() > 1, after
    `parallel.initialize_multihost`): every process runs this loop with
    an IDENTICAL dataset order (same seed), keeps only its own
    `host_batch_slice` rows of each batch, and the placements assemble
    the global sharded Arrays from the per-host pieces — the loop body,
    the step, and the returned metrics are unchanged (loss/correct are
    replicated outputs, identical on every process)."""
    import time

    from .multihost import host_batch_slice

    multi_host = jax.process_count() > 1
    data_sharding = NamedSharding(mesh, batch_spec())
    stacked_sharding = NamedSharding(mesh, P(None, *batch_spec()))

    def place(x, sharding):
        if multi_host:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    t0 = time.perf_counter()
    total_loss = jnp.zeros((), jnp.float32)  # device-side accumulation
    total_correct = jnp.zeros((), jnp.int32)
    total_seen = 0
    buf_x, buf_y = [], []

    n_proc = jax.process_count() if multi_host else 1

    def flush():
        nonlocal state, total_loss, total_correct, total_seen, rng
        nonlocal buf_x, buf_y
        if not buf_x:
            return
        rng, sub = jax.random.split(rng)
        xs = place(np.stack(buf_x), stacked_sharding)
        ys = place(np.stack(buf_y), stacked_sharding)
        b = buf_x[0].shape[0] * n_proc  # global rows per fused step
        state, losses, corrects = multi_step(state, xs, ys, sub)
        total_loss = total_loss + jnp.sum(losses) * b
        total_correct = total_correct + jnp.sum(corrects)
        total_seen += len(buf_x) * b
        buf_x, buf_y = [], []

    for images, labels in dataset:
        global_b = images.shape[0]
        if multi_host:
            sl = host_batch_slice(global_b)
            images, labels = images[sl], labels[sl]
        if multi_step is not None and fused_steps > 1:
            if buf_x and images.shape != buf_x[0].shape:
                flush()
            buf_x.append(images)
            buf_y.append(labels)
            if len(buf_x) == fused_steps:
                flush()
            continue
        rng, sub = jax.random.split(rng)
        images = place(images, data_sharding)
        labels = place(labels, data_sharding)
        state, loss, correct = train_step(state, images, labels, sub)
        total_loss = total_loss + loss * global_b
        total_correct = total_correct + correct
        total_seen += global_b
    flush()
    # value fetch = true barrier (utils/timing.py), before reading the
    # clock; folding in a param leaf forces the final step's update too
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    final_loss = float(
        total_loss + 0.0 * jnp.sum(leaf.astype(jnp.float32))
    )
    epoch_time = time.perf_counter() - t0
    return state, {
        "loss": final_loss / max(1, total_seen),
        "accuracy": 100.0 * float(total_correct) / max(1, total_seen),
        "time": epoch_time,
        "samples": total_seen,
    }
