from . import homo, pf
