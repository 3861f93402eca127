from . import species
from .species import SPECIES, species_index, species_indices, component_symbols
