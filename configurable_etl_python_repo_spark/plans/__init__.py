from .spec import ScanSpec, OpSpec, SortSpec, AnalytePlan, StudyPlan  # noqa: F401
from .compiler import Engine, ProgramError  # noqa: F401
