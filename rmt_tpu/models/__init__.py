from . import homo, particle, pb, pf
