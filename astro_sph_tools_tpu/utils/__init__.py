"""astro_sph_tools_tpu.utils"""
