from pointcloudhookup_tpu.io.las import LasData, read_las, write_las  # noqa: F401
