"""Solvers: functional API, fixed-step/adaptive methods, Solver class."""
from .results import OdeResult
from .solver_functions import solve_ode, solve_lmde, ODE_METHODS, LMDE_METHODS
from .fixed_step_solvers import (
    RK4_solver,
    jax_RK4_solver,
    scipy_expm_solver,
    jax_expm_solver,
    lanczos_diag_solver,
    jax_lanczos_diag_solver,
    jax_expm_parallel_solver,
    jax_RK4_parallel_solver,
)
from .adaptive import tpu_dopri5, tpu_dop853, tpu_rk_solve
from .jax_odeint import jax_odeint
from .scipy_solve_ivp import scipy_solve_ivp
from .solver_classes import Solver
from .perturbative_solvers import ExpansionModel, DysonSolver, MagnusSolver
from .fused_sweep import fused_sweep_solve, fused_adaptive_sweep_solve
from .analysis import (
    lindblad_steady_state,
    lindblad_steady_state_iterative,
    lindblad_steady_state_sweep,
    floquet_basis,
    FloquetResult,
    correlation_function,
    spectrum,
    spectrum_iterative,
)
from .monte_carlo import (
    solve_mc_trajectories,
    solve_mc_trajectories_sweep,
    MCResult,
    mc_expectation,
)
from .optimize import (
    optimize_controls,
    OptimizeResult,
    state_infidelity,
    unitary_infidelity,
)
from .sweep_interpolation import (
    interpolated_sweep_solve,
    interpolated_sweep_solve_2d,
    SweepInterpolationInfo,
    SweepInterpolation2DInfo,
)
