"""go_logagent_ray.functions"""
