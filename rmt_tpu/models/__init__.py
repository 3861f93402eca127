from . import homo, pb, pf
