from .integral import IntegralImages, bgr_to_gray, integral_images, tilted_integral

__all__ = ["IntegralImages", "bgr_to_gray", "integral_images", "tilted_integral"]
