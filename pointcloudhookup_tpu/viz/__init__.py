from pointcloudhookup_tpu.viz.boxes import (  # noqa: F401
    BBOX_PRESETS,
    adaptive_scale_for_height,
    box_lineset,
    expand_box_kuangxuan,
    get_bbox_preset,
    tower_display_geometries,
)
