"""Constitutive-engine protocol — the MicroPP call-boundary, made functional.

The reference drives MicroPP through a strict protocol (SURVEY.md §2.2):

    set_strain3(gp, eps)  ->  homogenize()  ->  get_stress3 / get_ctan3
                          ->  [Newton iterates repeat the above]
                          ->  update_vars()   (commits internal variables)

The crucial semantics (src/main.c:62 vs 83): ``homogenize`` computes the
trial response from the *committed* state without mutating it; only
``update_vars`` commits.  Functionally that is:

    stress, ctan, trial, diag = engine.homogenize(eps, state)   # pure
    state = trial                                               # commit

``state`` is a pytree batched over Gauss points with leading shape
(nex, ney, nez, NGP); engines are stateless/hashable so they can be closed
over in jit.

Diagnostics mirror the MicroPP surface used by the reference:
  - non_linear : bool per GP (micropp_C_is_non_linear; util.c:71 counts)
  - f_trial    : plastic trial function per GP (micropp_C_get_f_trial_max,
                 util.c:94-102 takes the global max)
  - cost       : per-GP solve cost (micropp_C_get_sigma_cost3; the VTU
                 'cost' field, output.c:179-187)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Protocol, Tuple

import jax


class HomogenizeResult(NamedTuple):
    stress: jax.Array       # (..., 6) Voigt stress at each GP
    ctan: jax.Array         # (..., 6, 6) consistent tangent at each GP
    trial_state: Any        # state pytree to commit at update_vars
    non_linear: jax.Array   # (...,) bool
    f_trial: jax.Array      # (...,)
    cost: jax.Array         # (...,)
    # (...,) bool: the engine's inner solve hit its iteration cap before
    # reaching tolerance (micro-FE RVEs).  None for closed-form engines,
    # whose response is exact by construction.
    unconverged: Any = None


class ConstitutiveEngine(Protocol):
    def init_state(self, batch_shape: Tuple[int, ...]) -> Any:
        """Fresh internal-variable pytree with leading dims batch_shape."""
        ...

    def homogenize(self, eps: jax.Array, state: Any) -> HomogenizeResult:
        """Pure trial response: eps (..., 6) engineering Voigt strain."""
        ...
