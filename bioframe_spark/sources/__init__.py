from . import bed
