from . import dopri5, fixed
from .dopri5 import odeint
