from . import batch, hetero, homo, particle, pb, pf
