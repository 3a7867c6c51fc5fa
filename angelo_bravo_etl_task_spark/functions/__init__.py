from .xmlgen import loinc_metadata_xml, xml_element
from .datetime_utils import format_run_timestamp

__all__ = ["loinc_metadata_xml", "xml_element", "format_run_timestamp"]
