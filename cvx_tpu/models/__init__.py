"""Model zoo (L5 of SURVEY.md): flagship applications built on the solver
stack.  Dist_KL (Kullback–Leibler distance minimization) is the reference's
primary use case (cvx/Dist_KL.scala, README.md:7-8)."""

from .dist_kl import (DistKL, FeasibilityScreen, KLObjective,
                      kl_feasibility_screen)
from .qp import LP, QP, DiagQP, QPCertificate, qp_certify

__all__ = ["DistKL", "FeasibilityScreen", "KLObjective", "QP", "DiagQP",
           "LP", "QPCertificate", "kl_feasibility_screen", "qp_certify"]
