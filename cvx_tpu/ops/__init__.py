"""Dense numerics core (L1/L2 of SURVEY.md): the TPU-native replacement for
the reference's Breeze/LAPACK layer (cvx/MatrixUtils.scala,
cvx/KKTSystem.scala, cvx/SymmetricLinearSystem.scala)."""

from .cholesky import (back_solve, chol_solve_factored, cholesky_solve,
                       forward_solve, regularized_cholesky, relative_residual,
                       tri_solve)
from .eigsolve import sym_solve_eig
from .equilibrate import ruiz_equilibrate
from .kkt import kkt_solve, sym_solve
from .nullspace import SolutionSpace, solution_space
from .testmat import (decaying_spectrum, nasty_rhs, random_orthogonal,
                      random_spd, sign_combination_matrix,
                      sign_combination_matrix_padded)

__all__ = [
    "back_solve", "chol_solve_factored", "cholesky_solve", "forward_solve",
    "regularized_cholesky", "relative_residual", "tri_solve", "sym_solve_eig",
    "ruiz_equilibrate", "kkt_solve", "sym_solve", "SolutionSpace",
    "solution_space", "decaying_spectrum", "nasty_rhs", "random_orthogonal",
    "random_spd", "sign_combination_matrix", "sign_combination_matrix_padded",
]
