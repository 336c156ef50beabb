from .spec import MAX_RECTS, CascadeSpec
from .haar_xml import parse_haar_xml, parse_haar_xml_bytes
from .zoo import CASCADE_NAMES, available_cascades, load_cascade

__all__ = [
    "MAX_RECTS", "CascadeSpec", "parse_haar_xml", "parse_haar_xml_bytes",
    "CASCADE_NAMES", "available_cascades", "load_cascade",
]
