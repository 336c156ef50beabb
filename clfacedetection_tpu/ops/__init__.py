from .integral import (IntegralImages, bgr_to_gray, bgr_to_gray_per_row,
                       bgra_to_gray, integral_images, invert,
                       tilted_integral)
from .resize import resize_bilinear_u8, resize_bilinear_u8_np, resize_coeffs

__all__ = [
    "IntegralImages", "bgr_to_gray", "bgr_to_gray_per_row",
    "bgra_to_gray", "integral_images",
    "invert", "tilted_integral", "resize_bilinear_u8",
    "resize_bilinear_u8_np", "resize_coeffs",
]
