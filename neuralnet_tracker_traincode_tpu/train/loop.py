"""Jitted data-parallel training step and training driver.

Contract: the reference's Lightning loop (`train.py`, `scripts/
train_poseestimator.py:299-456`): Adam with param-group lr scaling (variance
params 0.1x, transformer params 0.01x + wd 0.01), global-norm grad clip 1.0,
per-epoch LR schedule, fixed samples/epoch, SWA from 2/3 of training, best/last
checkpoints by validation loss, NaN watchdog.

TPU-first design: ONE jitted program per step runs augmentation + forward +
masked multi-task loss + backward + optimizer update, data-parallel over the
mesh ('data' axis); parameters/optimizer state are replicated and donated.
Loss scalars stay on device; the host only checks them at epoch boundaries.
"""

import dataclasses
import pickle
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralnet_tracker_traincode_tpu.augmentation.pipeline import (
    TrainAugmentationConfig,
    augment_batch_for_training,
)
from neuralnet_tracker_traincode_tpu.losses.criterion import MaskedMultiTaskCriterion
from neuralnet_tracker_traincode_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    swa_params: Any
    swa_batch_stats: Any
    swa_count: jax.Array


def label_parameters(params) -> Any:
    """Assign optimizer groups by module path.

    'variance': NLL scale modules (named uncertainty_*) train at 0.1x lr;
    'transformer': attention/transformer blocks at 0.01x lr + weight decay;
    'main': everything else. (`train_poseestimator.py:114-144`)
    """

    def label_of_path(path) -> str:
        keys = [getattr(p, "key", "") for p in path]
        if any(str(k).startswith("uncertainty") for k in keys):
            return "variance"
        if any("transformer" in str(k) for k in keys):
            return "transformer"
        return "main"

    return jax.tree_util.tree_map_with_path(lambda path, _: label_of_path(path), params)


def make_optimizer(
    base_lr: float,
    epoch_schedule: Callable[[int], float],
    steps_per_epoch: int,
    num_epochs: int,
    grad_clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    # The schedule is an arbitrary python function of the epoch; precompute it
    # into a table. The lookup is a gather-free where-sum: indexing a
    # compile-time-constant table costs ~25 ms per step on the TPU backend.
    table = np.asarray(
        [float(epoch_schedule(e)) for e in range(max(1, num_epochs))], np.float32
    )
    epoch_ids = np.arange(table.shape[0])

    def sched(mult):
        def lr(step):
            epoch = jnp.clip(step // steps_per_epoch, 0, table.shape[0] - 1)
            scale = jnp.sum(jnp.where(epoch_ids == epoch, table, 0.0))
            return base_lr * mult * scale

        return lr

    tx = optax.multi_transform(
        {
            "main": optax.adam(sched(1.0)),
            "variance": optax.adam(sched(0.1)),
            "transformer": optax.adamw(sched(0.01), weight_decay=0.01),
        },
        label_parameters,
    )
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)


@dataclasses.dataclass
class TrainerConfig:
    batchsize: int = 64
    lr: float = 1.0e-3
    epochs: int = 200
    samples_per_epoch: int = 10 * 1024  # `limit_train_batches` of the reference
    grad_clip_norm: float = 1.0
    swa_start_epoch: Optional[int] = None  # enables SWA when set
    aug: TrainAugmentationConfig = dataclasses.field(default_factory=TrainAugmentationConfig)

    @property
    def steps_per_epoch(self) -> int:
        return max(1, self.samples_per_epoch // self.batchsize)


class PoseTrainer:
    """Owns the jitted train/eval steps for a pose network + criterion."""

    def __init__(
        self,
        model,
        criterion: MaskedMultiTaskCriterion,
        config: TrainerConfig,
        categories: Dict[str, Any],
        epoch_schedule: Optional[Callable[[int], float]] = None,
        mesh=None,
    ):
        from neuralnet_tracker_traincode_tpu.train.schedules import exponential_up_then_steps

        self.model = model
        self.criterion = criterion
        self.config = config
        self.categories = dict(categories)
        self.mesh = mesh if mesh is not None else make_mesh()
        if epoch_schedule is None:
            n = config.epochs
            epoch_schedule = exponential_up_then_steps(max(1, n // 10), 0.1, [n // 2])
        self.epoch_schedule = epoch_schedule
        self.tx = make_optimizer(
            config.lr, epoch_schedule, config.steps_per_epoch, config.epochs, config.grad_clip_norm
        )
        self._replicated = replicated_sharding(self.mesh)
        self._sharded = batch_sharding(self.mesh)
        self._train_step = None
        self._train_step_multi = None
        self._eval_step = None

    # ---- state ------------------------------------------------------------
    def init_state(self, rng, example_image_shape) -> TrainState:
        x = jnp.zeros((2,) + tuple(example_image_shape), jnp.float32)
        variables = self.model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            x,
            coord_convention_id=jnp.zeros((2,), jnp.int32),
            train=True,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # SWA slots must be distinct buffers: the train step donates the whole
        # state, and aliased params would be donated twice.
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            swa_params=copy(params),
            swa_batch_stats=copy(batch_stats),
            swa_count=jnp.zeros((), jnp.int32),
        )
        return jax.device_put(state, self._replicated)

    # ---- steps ------------------------------------------------------------
    def _step_fn(self):
        """The pure per-step update, shared by the single-step jit and the
        scanned multi-step dispatch."""
        cfg = self.config
        categories = self.categories
        criterion = self.criterion
        model = self.model
        tx = self.tx

        def train_step(state: TrainState, batch: Dict[str, jax.Array], weight_matrix, rng):
            rng = jax.random.fold_in(rng, state.step)
            k_aug, k_dropout = jax.random.split(rng)
            labels = {
                k: v
                for k, v in batch.items()
                if k not in ("image", "param_index", "tag_id", "dataset_weight")
            }
            x, labels = augment_batch_for_training(
                k_aug, batch["image"], labels, categories, cfg.aug,
                param_index=batch.get("param_index"),
            )
            # Keep XLA from fusing the augmentation program into the model
            # forward: cross-stage fusions of the warp gather have measured
            # pathological lowerings on the TPU backend (see intensity.py).
            # Identity op, no numeric effect.
            x = jax.lax.optimization_barrier(x)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out = model.apply(
                    variables,
                    x,
                    coord_convention_id=labels.get("coord_convention_id"),
                    train=True,
                    mutable=["batch_stats"] if state.batch_stats else [],
                    rngs={"dropout": k_dropout},
                )
                out, mutated = out if isinstance(out, tuple) else (out, {})
                loss, byname = criterion(
                    out, labels, batch["tag_id"], weight_matrix,
                    dataset_weight=batch.get("dataset_weight"),
                )
                return loss, (mutated.get("batch_stats", state.batch_stats), byname)

            (loss, (new_bs, byname)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss}
            for name, (vals, ws) in byname.items():
                denom = jnp.maximum(jnp.sum(ws != 0), 1)
                metrics[name] = jnp.sum(vals) / denom
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt_state,
            )
            return new_state, metrics

        return train_step

    def _build_train_step(self):
        self._train_step = jax.jit(
            self._step_fn(),
            in_shardings=(
                self._replicated,
                self._sharded,
                self._replicated,
                self._replicated,
            ),
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )

    def _build_train_step_multi(self):
        from neuralnet_tracker_traincode_tpu.parallel.mesh import stacked_batch_sharding

        step = self._step_fn()

        def multi_step(state: TrainState, batches, weight_matrix, rng):
            # One dispatch covers K optimizer steps via lax.scan. The per-step
            # rng folds in state.step inside `step`, so every scan iteration
            # draws a distinct augmentation/dropout stream from the same key.
            def body(st, batch):
                return step(st, batch, weight_matrix, rng)

            state, metrics = jax.lax.scan(body, state, batches)
            return state, metrics  # each metric carries a leading (K,) axis

        self._train_step_multi = jax.jit(
            multi_step,
            in_shardings=(
                self._replicated,
                stacked_batch_sharding(self.mesh),
                self._replicated,
                self._replicated,
            ),
            out_shardings=(self._replicated, self._replicated),
            donate_argnums=(0,),
        )

    def train_step(self, state, batch, weight_matrix, rng):
        if self._train_step is None:
            self._build_train_step()
        return self._train_step(state, batch, weight_matrix, rng)

    def train_step_multi(self, state, batches, weight_matrix, rng):
        """Run K = batches.shape[0] optimizer steps in ONE device dispatch.

        Amortizes host->device dispatch latency (the dominant per-step cost for
        this small model, especially through a tunneled chip): the step loop is
        a lax.scan on device, so the host pays one dispatch per K steps.
        `batches` is the pytree of `shard_stacked_batch` (leading dims (K, B)).
        Returns the advanced state and per-step metrics stacked along axis 0 —
        the same rng stream and optimizer trajectory as K `train_step` calls,
        equal up to XLA re-fusion rounding (tests/test_train_loop.py pins the
        drift bound).
        """
        if self._train_step_multi is None:
            self._build_train_step_multi()
        return self._train_step_multi(state, batches, weight_matrix, rng)

    def update_swa(self, state: TrainState) -> TrainState:
        """Equal-weight running average (torch AveragedModel semantics)."""

        def avg(old, new):
            n = state.swa_count.astype(jnp.float32)
            return old + (new - old) / (n + 1.0)

        return state.replace(
            swa_params=jax.tree_util.tree_map(avg, state.swa_params, state.params),
            swa_batch_stats=jax.tree_util.tree_map(avg, state.swa_batch_stats, state.batch_stats),
            swa_count=state.swa_count + 1,
        )

    def weight_matrix(self, epoch: int) -> jax.Array:
        return jax.device_put(
            jnp.asarray(self.criterion.weight_matrix(epoch)), self._replicated
        )

    # ---- checkpointing ------------------------------------------------------
    def variables_of(self, state: TrainState, swa: bool = False) -> Dict[str, Any]:
        if swa:
            v = {"params": state.swa_params}
            if state.swa_batch_stats:
                v["batch_stats"] = state.swa_batch_stats
        else:
            v = {"params": state.params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
        return v

    def save_checkpoint(self, state: TrainState, filename: str, swa: bool = False):
        from neuralnet_tracker_traincode_tpu.models import io as model_io

        model_io.save_model(self.model, self.variables_of(state, swa), filename)


def check_not_nan(metrics: Dict[str, jax.Array], state, batch, dump_path="/tmp/notgood.pkl"):
    """NaN watchdog (`train.py:287-366`): on non-finite loss, dump state + batch.

    `metrics["loss"]` may be a scalar (train_step) or a (K,) vector of
    per-step losses (train_step_multi)."""
    loss = np.asarray(metrics["loss"]).sum()
    if not np.isfinite(loss):
        try:
            with open(dump_path, "wb") as f:
                pickle.dump(
                    {
                        "metrics": {k: np.asarray(v) for k, v in metrics.items()},
                        "batch": jax.tree_util.tree_map(np.asarray, batch),
                        "params": jax.tree_util.tree_map(np.asarray, state.params),
                    },
                    f,
                )
        except Exception as e:  # noqa: BLE001 - diagnostics must not mask the error
            print(f"Failed writing NaN dump: {e}")
        raise FloatingPointError(f"Non-finite loss detected: {loss}; dump at {dump_path}")
