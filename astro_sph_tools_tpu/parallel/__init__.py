"""astro_sph_tools_tpu.parallel"""
