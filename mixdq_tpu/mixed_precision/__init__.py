from . import election, ilp, sensitivity
