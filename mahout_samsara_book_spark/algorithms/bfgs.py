"""BFGS quasi-Newton minimizer (SURVEY §2C C6/C7; reference
``myMahoutApp/.../BFGS.scala:19-69``).

Driver-side numpy by design: the reference's signature takes function-valued
arguments (objective + gradient closures), which makes the loop inherently
driver code; the distributed extension point is evaluating f/∇f as DRM
computations inside the closures (the reference does the same). The
inverse-Hessian update is the standard Sherman-Morrison form
(Nocedal & Wright eq. 6.17): H ← (I − ρsyᵀ) H (I − ρysᵀ) + ρssᵀ.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

Vector = np.ndarray


def newton_step(
    f: Callable[[Vector], float], x: Vector, direction: Vector
) -> float:
    """Trivial unit line search (``BFGS.scala:69``)."""
    return 1.0


def bfgs(
    f: Callable[[Vector], float],
    grad: Callable[[Vector], Vector],
    x0: Vector,
    max_iter: int = 40,
    line_search: Callable = newton_step,
    epsilon: float = 1e-7,
) -> Vector:
    """Minimize f from x0; stop when ‖∇f‖₂ < epsilon or max_iter
    (``BFGS.scala:24,48`` convergence contract)."""
    x = np.asarray(x0, dtype=np.float64).copy()
    n = x.size
    h = np.eye(n)  # inverse-Hessian approximation
    g = np.asarray(grad(x), dtype=np.float64)
    for _ in range(max_iter):
        if np.linalg.norm(g) < epsilon:
            break
        direction = -(h @ g)
        alpha = line_search(f, x, direction)
        s = alpha * direction
        x_next = x + s
        g_next = np.asarray(grad(x_next), dtype=np.float64)
        y = g_next - g
        sy = float(s @ y)
        if abs(sy) > 1e-300:
            rho = 1.0 / sy
            t = np.eye(n) - rho * np.outer(s, y)
            h = t @ h @ t.T + rho * np.outer(s, s)
        x, g = x_next, g_next
    return x
