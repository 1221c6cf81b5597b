from mahout_samsara_book_spark.drm.drm import Drm, drm_broadcast

__all__ = ["Drm", "drm_broadcast"]
