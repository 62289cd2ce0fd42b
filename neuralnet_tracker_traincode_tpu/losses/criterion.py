"""Multi-task / multi-dataset criterion machinery.

Contract: `trackertraincode/train.py:41-97,372-439` (Criterion/CriterionGroup
with step-dependent weights, per-tag loss groups, weighted sum / batchsize).

TPU-first redesign: instead of slicing the fused batch into per-tag sub-batches
in Python (dynamic shapes), the fused train step evaluates EVERY loss term over
the full fixed-size batch and masks with a per-sample weight looked up from a
(num_tags, num_terms) weight matrix by the sample's tag id. Missing labels are
zero-padded by the loader; their terms get weight 0, so `sum(w*v)/batchsize`
is exactly the reference's "missing losses are zero" semantics
(`train.py:424-431`). Step-dependent weights are evaluated host-side per step
into the matrix, so no retracing occurs.
"""

from collections import defaultdict
from typing import Any, Callable, Dict, List, NamedTuple, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


class LossVal(NamedTuple):
    val: Any  # per-sample loss values
    weight: Any  # scalar or per-sample weights
    name: str


class Criterion(NamedTuple):
    name: str
    f: Callable[[Dict, Dict], Any]
    w: Union[float, Callable[[int], float]]

    def evaluate(self, pred, batch, step) -> List[LossVal]:
        return [LossVal(self.f(pred, batch), self._eval_weight(step), self.name)]

    def _eval_weight(self, step):
        return self.w if isinstance(self.w, float) else self.w(step)


class CriterionGroup(NamedTuple):
    criterions: List[Union["CriterionGroup", Criterion]]
    name: str = ""
    w: Union[float, Callable[[int], float]] = 1.0

    def _eval_weight(self, step):
        return self.w if isinstance(self.w, float) else self.w(step)

    def evaluate(self, pred, batch, step) -> List[LossVal]:
        w = self._eval_weight(step)
        lossvals = sum((c.evaluate(pred, batch, step) for c in self.criterions), start=[])
        return [LossVal(v.val, v.weight * w, self.name + v.name) for v in lossvals]


def concatenated_lossvals_by_name(vals: Sequence[LossVal]):
    """Group per-subbatch LossVals by name; returns {name: (values, weights)}."""
    value_lists = defaultdict(list)
    weight_lists = defaultdict(list)
    for v in vals:
        val = jnp.atleast_1d(v.val)
        w = v.weight
        if not hasattr(w, "shape") or getattr(w, "shape", ()) == ():
            w = jnp.full(val.shape, w, val.dtype)
        value_lists[v.name].append(val)
        weight_lists[v.name].append(jnp.atleast_1d(w))
    return {
        k: (jnp.concatenate(value_lists[k]), jnp.concatenate(weight_lists[k]))
        for k in value_lists
    }


def compute_loss_of_batches(preds, batches, step, loss):
    """Reference-style loss over a list of per-tag sub-batches (host/eval path).

    Contract: `train.py:372-439`. Returns (loss_sum, list of per-subbatch
    LossVal lists).
    """
    all_lossvals: List[List[LossVal]] = []
    offset = 0
    for subset in batches:
        (frames_in_subset,) = subset.meta.prefixshape
        subpreds = {}
        for k, v in preds.items():
            subpreds[k] = (
                v[offset : offset + frames_in_subset]
                if hasattr(v, "__getitem__")
                else v
            )
        loss_func = loss[subset.meta.tag] if isinstance(loss, dict) else loss
        multi_task_terms = loss_func.evaluate(subpreds, subset, step)
        if "dataset_weight" in subset:
            dw = jnp.asarray(subset["dataset_weight"])
            multi_task_terms = [v._replace(weight=v.weight * dw) for v in multi_task_terms]
        else:
            multi_task_terms = [
                v._replace(weight=jnp.full(jnp.atleast_1d(v.val).shape, v.weight))
                for v in multi_task_terms
            ]
        all_lossvals.append(multi_task_terms)
        offset += frames_in_subset
    batchsize = sum(max(s.meta.batchsize, 1) for s in batches)
    byname = concatenated_lossvals_by_name([v for terms in all_lossvals for v in terms])
    loss_sum = (
        jnp.concatenate([(values * weights) for values, weights in byname.values()]).sum()
        / batchsize
    )
    return loss_sum, all_lossvals


class _Term(NamedTuple):
    name: str
    f: Callable


def _loss_fingerprint(f) -> tuple:
    """Semantic dedup key for a loss callable.

    Two tags often configure equal-but-distinct loss objects (e.g. both build
    `QuatPoseLoss('approx_distance')`). Keying terms on id(f) would evaluate
    such duplicates separately over the full batch — O(terms) extra full-batch
    work as tag count grows. The loss classes here are plain objects whose
    behavior is fully determined by their simple attributes, so fingerprint on
    (type, sorted simple attrs); attributes that are not plain values (e.g. a
    GMM table) fall back to identity.
    """
    import functools
    import types

    if isinstance(
        f,
        (types.FunctionType, types.BuiltinFunctionType, types.MethodType, functools.partial),
    ):
        # Functions/lambdas/methods/partials DO have a (usually empty)
        # __dict__; fingerprinting them by attributes would collapse two
        # different lambdas into one term. Identity semantics instead.
        return (f,)
    d = getattr(f, "__dict__", None)
    if d is None:
        return (f,)
    attrs = []
    for k, v in sorted(d.items()):
        if isinstance(v, (str, int, float, bool, type(None))):
            attrs.append((k, v))
        elif isinstance(v, (tuple, list)) and all(
            isinstance(x, (str, int, float, bool, type(None))) for x in v
        ):
            attrs.append((k, tuple(v)))
        else:
            attrs.append((k, id(v)))
    return (type(f), tuple(attrs))


def _flatten_group(crit, prefix="", scale_fns=()):
    """Yield (name, f, composed_weight_fn) leaves of a criterion tree."""
    if isinstance(crit, Criterion):
        fns = scale_fns + (crit._eval_weight,)

        def weight_fn(step, fns=fns):
            w = 1.0
            for fn in fns:
                w = w * fn(step)
            return w

        yield (prefix + crit.name, crit.f, weight_fn)
    elif isinstance(crit, CriterionGroup):
        for c in crit.criterions:
            yield from _flatten_group(c, prefix + crit.name, scale_fns + (crit._eval_weight,))
    else:
        raise TypeError(type(crit))


class MaskedMultiTaskCriterion:
    """Fused-batch loss with per-tag masking (the jitted train-step path).

    Build from a {tag: Criterion|CriterionGroup} dict plus the list of tags
    actually present in training (their order defines tag ids).
    """

    def __init__(self, crit_by_tag: Dict[Any, Union[Criterion, CriterionGroup]], tags: Sequence[Any]):
        self.tags = list(tags)
        self.tag_index = {t: i for i, t in enumerate(self.tags)}
        # Deduplicate terms shared between tags — by semantic fingerprint, so
        # equal-but-distinct loss objects map to ONE term evaluated once over
        # the fused batch (see _loss_fingerprint).
        term_key_to_idx = {}
        self.terms: List[_Term] = []
        # weight_fns[tag_idx][term_idx] -> callable(step) or None
        self.weight_fns: List[Dict[int, Callable]] = [dict() for _ in self.tags]
        for tag in self.tags:
            crit = crit_by_tag[tag]
            for name, f, weight_fn in _flatten_group(crit):
                key = (name, _loss_fingerprint(f))
                if key not in term_key_to_idx:
                    term_key_to_idx[key] = len(self.terms)
                    self.terms.append(_Term(name, f))
                j = term_key_to_idx[key]
                ti = self.tag_index[tag]
                prev = self.weight_fns[ti].get(j)
                if prev is None:
                    self.weight_fns[ti][j] = weight_fn
                else:
                    self.weight_fns[ti][j] = lambda step, a=prev, b=weight_fn: a(step) + b(step)

    @property
    def num_terms(self) -> int:
        return len(self.terms)

    def weight_matrix(self, step) -> np.ndarray:
        """Evaluate the (num_tags, num_terms) weight matrix host-side."""
        W = np.zeros((len(self.tags), len(self.terms)), np.float32)
        for ti, fns in enumerate(self.weight_fns):
            for j, fn in fns.items():
                W[ti, j] = fn(step)
        return W

    def __call__(self, preds, batch, tag_id, weight_matrix, dataset_weight=None):
        """Compute (loss_sum, {name: (values, per_sample_weights)}) on device.

        preds/batch: dicts of fused (B, ...) arrays; tag_id: (B,) int array;
        weight_matrix: (num_tags, num_terms); dataset_weight: optional (B,).

        Metric semantics note: loss_sum is sum(w*v)/B over the FULL batch —
        bit-equal to the reference's `default_compute_loss` (train.py:424-431,
        missing losses count as 0). The per-name pairs are masked raw values
        (val*(w!=0), w); the train loop reports sum(vals)/count(w!=0), i.e.
        the mean over samples whose tag defines the term — the same thing the
        reference plots (LitModel logs the concatenated raw sub-batch values
        per name, `train_poseestimator.py:317-323`, and the plotter averages
        them), NOT the full-batch mean used for loss_sum.
        """
        losses = {}
        B = tag_id.shape[0]
        total = jnp.zeros((), jnp.float32)
        for j, term in enumerate(self.terms):
            val = term.f(preds, batch)  # (B,)
            w = weight_matrix[tag_id, j]  # (B,)
            if dataset_weight is not None:
                w = w * dataset_weight
            total = total + jnp.sum(val * w)
            if term.name in losses:
                pv, pw = losses[term.name]
                losses[term.name] = (pv + val * (w != 0), pw + w)
            else:
                losses[term.name] = (val * (w != 0), w)
        return total / B, losses
