from . import film, thermo, transport
