"""Port of RelationalQuerySuite (NonRecursiveQuerySuites.scala:20-111):
scans, constant/comparison filters (incl. dates), projection with wildcards,
2- and 3-way joins, arithmetic in head, multi-rule union."""

import datetime as dt

from .conftest import run_case
from .golden import ADDRESS, DEPARTMENT, EMPLOYEE, EMPLOYEE_SALARY

DATABASE = (
    "database({"
    "employee(EmployeeId:integer, DepartmentId:integer, FirstName:string, LastName:string),"
    "department(DepartmentId:integer, DepartmentName:string),"
    "employee_salary(EmployeeId:integer, Salary:double, Start:datetime, End:datetime),"
    "address(EmployeeId:integer, Street:string, City:string, State:string, Zip:integer)"
    "})."
)


def test_scan(spark):
    run_case(
        spark, DATABASE, "employee(EmployeeId, DepartmentId, FirstName, LastName).",
        {"employee": EMPLOYEE},
        [(1, 1, "Bob", "Jones"), (2, 1, "Jane", "Jones"), (3, 2, "Sam", "Johnson")],
    )


def test_constant_filter_in_goal(spark):
    run_case(
        spark, DATABASE, "employee(EmployeeId,DepartmentId,'Bob',LastName).",
        {"employee": EMPLOYEE},
        [(1, 1, "Bob", "Jones")],
    )


def test_date_comparison_filters(spark):
    program = DATABASE + (
        "employeeSalaryHistory(EmployeeID, Salary, Start, End) <- "
        "employee_salary(EmployeeID, Salary, Start, End), "
        "Start <= '2010-12-01', End >= '2014-01-01'."
    )
    run_case(
        spark, program, "employeeSalaryHistory(EmployeeID, Salary, Start, End).",
        {"employee": EMPLOYEE, "employee_salary": EMPLOYEE_SALARY},
        [(1, 50000.0, dt.date(2010, 12, 1), dt.date(2079, 1, 1))],
    )


def test_projection_with_wildcards(spark):
    program = DATABASE + "employeeNames(FirstName, LastName) <- employee(_,_,FirstName, LastName)."
    run_case(
        spark, program, "employeeNames(FirstName, LastName).",
        {"employee": EMPLOYEE},
        [("Sam", "Johnson"), ("Jane", "Jones"), ("Bob", "Jones")],
    )


def test_two_way_join(spark):
    program = DATABASE + (
        "employeeSalary(FirstName, Salary) <- "
        "employee(EmployeeId, _, FirstName,_), employee_salary(EmployeeId, Salary,_,_)."
    )
    run_case(
        spark, program, "employeeSalary(FirstName, Salary).",
        {"employee": EMPLOYEE, "employee_salary": EMPLOYEE_SALARY},
        [("Bob", 50000.0), ("Jane", 60000.0)],
    )


def test_join_with_comparison(spark):
    program = DATABASE + (
        "highEarners(FirstName, LastName, Salary) <- "
        "employee(EmployeeId, _, FirstName,LastName), "
        "employee_salary(EmployeeId, Salary,_,_), Salary > 50000."
    )
    run_case(
        spark, program, "highEarners(FirstName, LastName, Salary).",
        {"employee": EMPLOYEE, "employee_salary": EMPLOYEE_SALARY},
        [("Jane", "Jones", 60000.0)],
    )


def test_three_way_join(spark):
    program = DATABASE + (
        "employeeAddressDepartment(EmployeeId, DepartmentId, FirstName, LastName, "
        "Street, City, State, Zip, DepartmentName) <-"
        "employee(EmployeeId, DepartmentId, FirstName, LastName), "
        "address(EmployeeId, Street, City, State, Zip), "
        "department(DepartmentId, DepartmentName)."
    )
    run_case(
        spark, program,
        "employeeAddressDepartment(EmployeeId, DepartmentId, FirstName, LastName, "
        "Street, City, State, Zip, DepartmentName).",
        {"employee": EMPLOYEE, "department": DEPARTMENT, "address": ADDRESS},
        [
            (2, 1, "Jane", "Jones", "455 1st ave.", "New York City", "AZ", 10001, "Finance"),
            (1, 1, "Bob", "Jones", "123 Main Street", "Los Angeles", "CA", 90202, "Finance"),
        ],
    )


def test_arithmetic_in_binding(spark):
    program = DATABASE + (
        "employeeSalaryAddition(FirstName, LastName, AdjustedSalary) <- "
        "employee(EmployeeId, _, FirstName, LastName),"
        "employee_salary(EmployeeId, Salary, _, _), AdjustedSalary = Salary + 5000."
    )
    run_case(
        spark, program, "employeeSalaryAddition(FirstName, LastName, AdjustedSalary).",
        {"employee": EMPLOYEE, "employee_salary": EMPLOYEE_SALARY},
        [("Jane", "Jones", 65000.0), ("Bob", "Jones", 55000.0)],
    )


def test_multi_rule_union(spark):
    program = DATABASE + (
        "westCoastEmployees(EmployeeID, FirstName, LastName) <- "
        "employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'AZ', _)."
        "westCoastEmployees(EmployeeID, FirstName, LastName) <- "
        "employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'CA', _)."
        "westCoastEmployees(EmployeeID, FirstName, LastName) <- "
        "employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'ID', _)."
        "westCoastEmployees(EmployeeID, FirstName, LastName) <- "
        "employee(EmployeeID, _, FirstName, LastName), address(EmployeeID, _, _, 'NV', _)."
    )
    run_case(
        spark, program, "westCoastEmployees(EmployeeID, FirstName, LastName).",
        {"employee": EMPLOYEE, "address": ADDRESS},
        [(1, "Bob", "Jones"), (2, "Jane", "Jones")],
    )
