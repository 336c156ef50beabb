from .spec import MAX_RECTS, CascadeSpec
from .haar_xml import parse_haar_xml, parse_haar_xml_bytes
from .haar_xml_writer import haar_xml_bytes, write_haar_xml
from .cart_text import (cart_text_stages, load_cascade_directory,
                        parse_cart_text)
from .compile import (CompiledCascade, ScaledCascade, compile_cascade,
                      truncate_cascade)
from .zoo import CASCADE_NAMES, available_cascades, load_cascade

__all__ = [
    "MAX_RECTS", "CascadeSpec", "parse_haar_xml", "parse_haar_xml_bytes",
    "haar_xml_bytes", "write_haar_xml",
    "cart_text_stages", "load_cascade_directory", "parse_cart_text", "CompiledCascade", "ScaledCascade",
    "compile_cascade", "truncate_cascade",
    "CASCADE_NAMES", "available_cascades", "load_cascade",
]
