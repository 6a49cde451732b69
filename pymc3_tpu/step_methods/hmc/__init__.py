from .hmc import HamiltonianMC
from .nuts import NUTS

__all__ = ["HamiltonianMC", "NUTS"]
