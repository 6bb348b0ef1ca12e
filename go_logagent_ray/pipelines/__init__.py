"""go_logagent_ray.pipelines"""
