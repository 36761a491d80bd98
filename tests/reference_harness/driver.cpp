// Headless test driver around the REFERENCE engine (compiled read-only from
// /root/reference at test time; nothing from the reference is vendored).
//
// Loads a point cloud from a text file (one "x y z" row per particle),
// seeds the reference SPH_SM_monodomain engine exactly like init_mesh
// (main.cpp:479-496: Init_Fluid + turnOnStim_Mesh), runs N steps with an
// optional turnOffStim at step T (the idle() protocol, main.cpp:329-334),
// and dumps per-particle pos/vel/Vm/dens/pres after every step to stdout.
// Used by test_reference_fidelity.py to diff the JAX engine's trajectories
// against the real C++ dynamics.

#include <SPH_SM_monodomain.h>

#include <cstdio>
#include <cstdlib>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr,
                     "usage: driver cloud.txt num_steps stim_off_step "
                     "[quadratic] [flip_volume] [add_visc] [summary] "
                     "[stim_cube]\n");
        return 2;
    }
    const char* cloud_path = argv[1];
    int num_steps = std::atoi(argv[2]);
    int stim_off = std::atoi(argv[3]);
    int quadratic = argc > 4 ? std::atoi(argv[4]) : 0;
    int flip_volume = argc > 5 ? std::atoi(argv[5]) : 0;
    float add_visc = argc > 6 ? std::atof(argv[6]) : 0.0f;
    // summary mode: one "S step mean_displacement mean_vm" line per step
    // instead of the full per-particle dump (keeps 500-step runs on the
    // 18k cloud at KB of output instead of hundreds of MB)
    int summary = argc > 7 && std::atoi(argv[7]) != 0;
    // stimulus protocol: 0 = turnOnStim_Mesh (init_mesh, main.cpp:487),
    // 1 = turnOnStim_Cube (init_cube, main.cpp:476)
    int stim_cube = argc > 8 && std::atoi(argv[8]) != 0;

    std::vector<m3Vector> positions;
    {
        FILE* f = std::fopen(cloud_path, "r");
        if (!f) { std::fprintf(stderr, "no cloud file\n"); return 2; }
        float x, y, z;
        while (std::fscanf(f, "%f %f %f", &x, &y, &z) == 3)
            positions.push_back(m3Vector(x, y, z));
        std::fclose(f);
    }

    SPH_SM_monodomain* sph = new SPH_SM_monodomain();
    if (quadratic) sph->flip_quadratic();
    if (flip_volume) sph->flip_volume();        // h:155 runtime toggle
    if (add_visc != 0.0f) sph->add_viscosity(add_visc);  // cpp:87-91
    sph->Init_Fluid(positions);
    if (stim_cube) sph->turnOnStim_Cube(positions);
    else sph->turnOnStim_Mesh(positions);

    int n = sph->Get_Particle_Number();
    std::printf("n %d\n", n);
    for (int step = 0; step < num_steps; ++step) {
        if (step == stim_off) sph->turnOffStim();
        sph->Animation();
        Particle* p = sph->Get_Paticles();
        if (summary) {
            double disp = 0.0, vm = 0.0;
            for (int i = 0; i < n; ++i) {
                disp += (double)p[i].getDisplacement();
                vm += (double)p[i].Vm;
            }
            std::printf("S %d %.9g %.9g\n", step, disp / n, vm / n);
            continue;
        }
        std::printf("step %d\n", step);
        for (int i = 0; i < n; ++i) {
            std::printf("%.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g %.9g\n",
                        p[i].pos.x, p[i].pos.y, p[i].pos.z,
                        p[i].vel.x, p[i].vel.y, p[i].vel.z,
                        p[i].Vm, p[i].dens, p[i].pres);
        }
    }
    delete sph;
    return 0;
}
