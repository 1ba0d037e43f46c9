// Reference-physics golden driver.
//
// Links the *reference's own* physics engine — nocturne_physics
// (FreeCar.cpp, BaseCar.cpp, PhysicsSimulation.cpp, Singletons.cpp) plus the
// vendored Box2D — built out-of-tree from /root/reference (read-only), and
// drives it with scripted action sequences to produce golden state streams
// for tests/test_physics_goldens.py.
//
// This converts the repo's FreeCar parity tests from "ported formulas" to
// "matched engine": the JAX freecar_step (ctrl_sim_tpu/env/dynamics.py) is
// asserted against trajectories EXECUTED by the machine the reference's
// eval/data-gen actually runs (evaluators/evaluator.py:33-41 sets
// physics_simulated=True for every vehicle; PhysicsSimulation::Step runs
// FreeCar::Step per car then b2World::Step(dt, 8, 3)).
//
// Protocol (stdin, whitespace-separated text):
//   ncars dt steps
//   per car:  width length x y heading speed      (world frame, Vehicle ctor)
//   per step, per car:  accel steer
// Action application replicates the Python-side split used by BOTH data-gen
// and eval (data/generate_offline_rl_dataset.py:115-119,
// policies/autoregressive_policy.py:268-272, evaluators/evaluator.py:186-190):
//   accel > 0  ->  Throttle(accel)   else  Brake(|accel|);   Turn(steer).
// Body creation replicates Vehicle::CreatePhysicsBody (vehicle.cc:137-178):
//   body angle = heading - pi/2, linear velocity = speed * (cos, sin)(heading).
//
// Output (stdout): per step, per car, one line:
//   x y heading speed vx vy angular_velocity
// with heading/speed read back the way Vehicle::Step does (vehicle.cc:44-52):
//   heading = body angle + pi/2, speed = |v|.

#include <cmath>
#include <cstdio>
#include <vector>

#include "FreeCar.h"
#include "PhysicsSimulation.h"
#include "Singletons.h"
#include "box2d/box2d.h"

namespace {

// FreeCar's Box2D body (BaseCar::m_Body) is protected; expose it for state
// readout without touching the reference's behavior.
class InspectableCar : public physics::FreeCar {
 public:
  InspectableCar(float width, float length) : physics::FreeCar(width, length) {}
  const b2Body* body() const { return m_Body; }
};

}  // namespace

int main() {
  int ncars = 0, steps = 0;
  float dt = 0.1f;
  if (std::scanf("%d %f %d", &ncars, &dt, &steps) != 3) return 1;

  physics::PhysicsSimulation* sim = physics::GetPhysicsSimulation();
  std::vector<InspectableCar*> cars;
  cars.reserve(ncars);
  for (int i = 0; i < ncars; ++i) {
    float width, length, x, y, heading, speed;
    if (std::scanf("%f %f %f %f %f %f", &width, &length, &x, &y, &heading,
                   &speed) != 6)
      return 1;
    InspectableCar* car = new InspectableCar(width, length);
    // Vehicle::CreatePhysicsBody order: SetAngle, SetPosition, SetSpeed
    car->SetAngle(heading - static_cast<float>(M_PI) * 0.5f);
    car->SetPosition(b2Vec2(x, y));
    car->SetSpeed(b2Vec2(speed * std::cos(heading), speed * std::sin(heading)));
    sim->AddCar(car);
    cars.push_back(car);
  }

  std::vector<float> accel(ncars), steer(ncars);
  for (int t = 0; t < steps; ++t) {
    for (int i = 0; i < ncars; ++i) {
      if (std::scanf("%f %f", &accel[i], &steer[i]) != 2) return 1;
      if (accel[i] > 0.0f)
        cars[i]->Throttle(accel[i]);
      else
        cars[i]->Brake(std::fabs(accel[i]));
      cars[i]->Turn(steer[i]);
    }
    sim->Step(dt);
    for (int i = 0; i < ncars; ++i) {
      b2Vec2 pos = cars[i]->GetPosition();
      const b2Body* body = cars[i]->body();
      b2Vec2 vel = body->GetLinearVelocity();
      float angvel = body->GetAngularVelocity();
      float heading = cars[i]->GetAngle() + static_cast<float>(M_PI) * 0.5f;
      float speed = cars[i]->GetSpeed();
      std::printf("%.9g %.9g %.9g %.9g %.9g %.9g %.9g\n", pos.x, pos.y,
                  heading, speed, vel.x, vel.y, angvel);
    }
  }
  return 0;
}
