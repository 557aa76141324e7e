from .angular import AngularVectors
from .angular_int import AngularIntVectors
