"""Trainable kinetic-functional template.

TPU-native rebuild of the reference ``KineticFunctional(torch.nn.Module)``
template (/root/reference/src/professad/functionals.py:83-200).  Parameters
live in a plain dict-of-arrays pytree (``self.params``) so that

* ``functional.apply(params, box_vecs, den)`` is a pure function — gradients
  w.r.t. functional parameters come from ``jax.grad`` over ``params``;
* ``functional(box_vecs, den)`` / ``functional.forward(...)`` close over the
  current ``self.params`` for drop-in use as an energy term.

Optimization uses optax (Rprop if available, else Adam), replacing
``torch.optim.Rprop`` (reference functionals.py:107).  Checkpointing pickles
``(init_args, params, opt_state, curves)`` — the flat-pytree equivalent of
``torch.save`` (reference functionals.py:132-156).
"""

import pickle

import jax
import jax.numpy as jnp

try:  # optax.rprop appeared in newer optax; fall back gracefully
    import optax
    _OPT = optax.rprop(learning_rate=0.1) if hasattr(optax, "rprop") else optax.adam(1e-2)
except Exception:  # pragma: no cover - optax is baked into the image
    optax = None
    _OPT = None

__all__ = ["KineticFunctional"]


class KineticFunctional:
    """Base class for kinetic functionals with tunable parameters.

    Subclasses set ``self.params`` (dict of jnp arrays) in ``__init__`` and
    implement ``apply(params, box_vecs, den)``.
    """

    def __init__(self, init_args=None):
        self.init_args = init_args
        self.params = {}
        self.training_curve, self.validation_curve = [], []
        self.optimizer = None
        self.opt_state = None

    # -- reference-API compatibility ------------------------------------
    def initialize(self):
        """Set up the parameter optimizer (parity: functionals.py:101-108)."""
        if _OPT is not None:
            self.optimizer = _OPT
            self.opt_state = self.optimizer.init(self.params)

    def param_grad(self, requires_grad=True):
        """No-op in JAX (grads are taken functionally); kept for API parity."""

    def set_device(self, device=None):
        """Move parameters to a device (parity: functionals.py:110-120)."""
        if device is not None:
            self.params = jax.device_put(self.params, device)

    # -- forward ----------------------------------------------------------
    def apply(self, params, box_vecs, den):
        raise NotImplementedError

    def forward(self, box_vecs, den):
        return self.apply(self.params, box_vecs, den)

    def __call__(self, box_vecs, den):
        return self.forward(box_vecs, den)

    # -- training helpers ---------------------------------------------------
    def grid_error(self, target, prediction, norm=False):
        """Mean squared error on a grid (parity: functionals.py:158-175)."""
        if norm:
            rng = jnp.where(jnp.all(target == 0), 1.0,
                            (jnp.max(target) - jnp.min(target)) ** 2)
            return jnp.mean((target - prediction) ** 2) / rng
        return jnp.mean((target - prediction) ** 2)

    def scalar_error(self, target, prediction):
        """Relative squared scalar error (parity: functionals.py:177-189)."""
        norm = jnp.where(target == 0, 1.0, target * target)
        return (target - prediction) ** 2 / norm

    def update_params(self, loss_fn):
        """One optimizer step on ``loss_fn(params) -> scalar``
        (parity: functionals.py:191-200, but functional-style)."""
        loss, grads = jax.value_and_grad(loss_fn)(self.params)
        updates, self.opt_state = self.optimizer.update(grads, self.opt_state,
                                                        self.params)
        self.params = optax.apply_updates(self.params, updates)
        return loss

    # -- checkpointing -------------------------------------------------------
    def save(self, path):
        """Pickle params + optimizer state (parity: functionals.py:132-140)."""
        blob = {
            "init_args": self.init_args,
            "params": jax.tree_util.tree_map(lambda a: jax.device_get(a), self.params),
            "opt_state": jax.device_get(self.opt_state) if self.opt_state is not None else None,
            "training_curve": self.training_curve,
            "validation_curve": self.validation_curve,
        }
        with open(path, "wb") as fh:
            pickle.dump(blob, fh)

    @classmethod
    def load(cls, path):
        """Restore a saved functional (parity: functionals.py:142-156)."""
        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        model = cls(blob["init_args"])
        model.params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        if blob["opt_state"] is not None:
            model.opt_state = blob["opt_state"]
        model.training_curve = blob["training_curve"]
        model.validation_curve = blob["validation_curve"]
        return model
