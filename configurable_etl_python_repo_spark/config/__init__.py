from .xlsx import read_workbook, sheet_records  # noqa: F401
from .excel import parse_workbook, parse_study  # noqa: F401
from .program import analyte_from_dict, study_from_dict  # noqa: F401
